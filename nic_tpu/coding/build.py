"""Builds the native rANS library on demand (g++, no external deps)."""

import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "rans.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "librans.so")
_lock = threading.Lock()


def library_path() -> str:
    """Return the path to librans.so, compiling it if missing or stale."""
    with _lock:
        if (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            cmd = [
                "g++",
                "-O3",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-pthread",
                "-o",
                _LIB,
                _SRC,
            ]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB
