"""``python -m photon_ml_spark <command> --config <json>`` — the
zero-install invocation path (equivalent to the ``photon-ml-spark``
console script from ``pip install -e .``). The reference's analog is
``spark-submit --class com.linkedin.photon.ml.Driver photon-all.jar``;
here ``spark-submit photon_ml_spark/__main__.py`` works the same way
because the module only depends on the package being importable."""

from photon_ml_spark.cli import main

if __name__ == "__main__":
    main()
