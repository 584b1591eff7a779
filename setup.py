"""Shim for environments without the `wheel` package, where pip's
PEP 660 editable path (build_editable → bdist_wheel) cannot run:
`python setup.py develop --user` installs the egg-link + the
photon-ml-spark console script from pyproject.toml metadata. Normal
environments just `pip install -e .`."""
from setuptools import setup

setup()
