"""Native (C++) data-plane tier: build-on-first-use CPython extension with a
transparent fallback to the pure-Python/pandas path.

The reference has no native components at all (SURVEY.md §2 language note);
this tier exists because the behaviors compiler is the framework's hottest
host-side loop and feeds every training/eval run.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_SRC = _HERE / "behaviors_compiler.cpp"
_module = None
_build_attempted = False


def _ext_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _HERE / f"_nrtpu_native{suffix}"


def _build() -> bool:
    """Compile the extension with g++ (no pip/pybind11 needed)."""
    include = sysconfig.get_paths()["include"]
    out = _ext_path()
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++20",
        f"-I{include}",
        str(_SRC),
        "-o",
        str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out.exists()
    except (subprocess.SubprocessError, OSError):
        return False


def load() -> Optional[object]:
    """The extension module, building it on first use; None if unavailable or
    disabled via NRTPU_NO_NATIVE=1."""
    global _module, _build_attempted
    if os.environ.get("NRTPU_NO_NATIVE") == "1":
        return None
    if _module is not None:
        return _module
    ext = _ext_path()
    # Rebuild when the source is newer than the binary, or the binary is gone.
    if not ext.exists() or _SRC.stat().st_mtime > ext.stat().st_mtime:
        if _build_attempted:
            return None
        _build_attempted = True
        if not _build():
            return None
    if str(_HERE) not in sys.path:
        sys.path.insert(0, str(_HERE))
    try:
        import _nrtpu_native  # noqa: F401

        _module = _nrtpu_native
    except ImportError:
        _module = None
    return _module
