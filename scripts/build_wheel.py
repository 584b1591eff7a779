"""Offline wheel builder (stdlib only).

The sandbox ships setuptools but neither ``wheel`` nor ``build``, and
package installs are off-limits — so this builds the
``photon_ml_spark-<ver>-py3-none-any.whl`` artifact directly from the
public wheel spec (PEP 427: a zip of the package tree plus a
``*.dist-info/`` with METADATA / WHEEL / RECORD / entry_points.txt).
Name, version, and console scripts are read from pyproject.toml, so
this stays in lockstep with the real packaging metadata.

    python scripts/build_wheel.py [out_dir]    # default: dist/

Prints the built wheel path. Used by scripts/multi_jvm_smoke.py's
wheel-delivery mode (the production ``--py-files`` story) and
validated importable-from-zip by tests/test_packaging.py.
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _record_line(arcname: str, data: bytes) -> str:
    digest = base64.urlsafe_b64encode(
        hashlib.sha256(data).digest()
    ).rstrip(b"=").decode()
    return f"{arcname},sha256={digest},{len(data)}"


def build_wheel(out_dir: str) -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    name = proj["name"].replace("-", "_")
    version = proj["version"]
    dist_info = f"{name}-{version}.dist-info"
    wheel_name = f"{name}-{version}-py3-none-any.whl"
    os.makedirs(out_dir, exist_ok=True)
    wheel_path = os.path.join(out_dir, wheel_name)

    pkg_root = os.path.join(REPO, name)
    entries: list[tuple[str, bytes]] = []
    for root, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            p = os.path.join(root, f)
            arc = os.path.relpath(p, REPO)
            with open(p, "rb") as fh:
                entries.append((arc, fh.read()))

    metadata = (
        "Metadata-Version: 2.1\n"
        f"Name: {proj['name']}\n"
        f"Version: {version}\n"
        f"Summary: {proj.get('description', '')}\n"
    ).encode()
    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: photon-ml-spark-build (stdlib)\n"
        "Root-Is-Purelib: true\n"
        "Tag: py3-none-any\n"
    ).encode()
    scripts = proj.get("scripts", {})
    ep = ""
    if scripts:
        ep = "[console_scripts]\n" + "".join(
            f"{k} = {v}\n" for k, v in sorted(scripts.items())
        )
    entries.append((f"{dist_info}/METADATA", metadata))
    entries.append((f"{dist_info}/WHEEL", wheel_meta))
    if ep:
        entries.append((f"{dist_info}/entry_points.txt", ep.encode()))

    record = "\n".join(
        [_record_line(a, d) for a, d in entries]
        + [f"{dist_info}/RECORD,,", ""]
    ).encode()

    with zipfile.ZipFile(wheel_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, data in entries:
            # fixed timestamp: byte-identical wheels per source state
            zi = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data)
        zi = zipfile.ZipInfo(
            f"{dist_info}/RECORD", date_time=(2020, 1, 1, 0, 0, 0)
        )
        zi.external_attr = 0o644 << 16
        zf.writestr(zi, record)
    return wheel_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    print(build_wheel(out))
