"""Native (C) host-runtime components, built on demand with the system
toolchain. Every native piece has a pure-Python fallback; import failures
degrade gracefully."""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_bpe_mod = None
_build_attempted = False


def _build_bpe() -> Optional[object]:
    """Compile bpe_merge.c into _bpe_native with cc; cache the .so here."""
    src = os.path.join(_NATIVE_DIR, "bpe_merge.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_NATIVE_DIR, f"_bpe_native{suffix}")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        include = sysconfig.get_paths()["include"]
        cc = os.environ.get("CC", "cc")
        cmd = [cc, "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", out]
        subprocess.run(cmd, check=True, capture_output=True)
    if _NATIVE_DIR not in sys.path:
        sys.path.insert(0, _NATIVE_DIR)
    import _bpe_native  # noqa: F401

    return _bpe_native


def get_bpe_native() -> Optional[object]:
    """The _bpe_native module, building it on first use; None when unavailable."""
    global _bpe_mod, _build_attempted
    if _bpe_mod is not None:
        return _bpe_mod
    if _build_attempted:
        return None
    _build_attempted = True
    try:
        _bpe_mod = _build_bpe()
    except Exception as e:  # no toolchain / sandbox: fall back to pure python
        print(f">> native BPE unavailable ({e!r}); using pure-python encoder")
        _bpe_mod = None
    return _bpe_mod
