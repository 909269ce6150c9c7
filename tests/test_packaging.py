"""Packaging metadata sanity (SURVEY §2 C9: the reference ships buildable
.sln/.vcxproj per project, ref 特征点检测.vcxproj:1-60; the TPU framework
ships a pip-installable pyproject — a fresh-venv editable install + import +
stitch smoke test is run out-of-band, see round-4 notes)."""

import os
import tomllib


def test_pyproject_metadata_matches_package():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "imagestitch-tpu"
    import imagestitch_tpu
    assert proj["version"] == imagestitch_tpu.__version__
    deps = " ".join(proj["dependencies"])
    assert "jax" in deps and "numpy" in deps
    assert proj["scripts"]["imagestitch-tpu"] == "imagestitch_tpu.cli:main"
    # native sources + the ORB differential pattern table ship as data
    pkgdata = meta["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkgdata["imagestitch_tpu.native"]
