"""On-demand native build: compiles .cpp sources into shared libraries next
to themselves (cached by mtime). Uses the baked-in g++; no external deps."""

from __future__ import annotations

import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()


def build_shared(name: str) -> str:
    """Compile native/<name>.cpp -> native/lib<name>.so (if stale); returns
    the library path."""
    src = os.path.join(_HERE, f"{name}.cpp")
    lib = os.path.join(_HERE, f"lib{name}.so")
    with _LOCK:
        if (not os.path.exists(lib)
                or os.path.getmtime(lib) < os.path.getmtime(src)):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src, "-o", lib]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib
