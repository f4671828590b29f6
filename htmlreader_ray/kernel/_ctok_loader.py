"""Build-on-first-import loader for the C tokenizer accelerator.

Compiles _ctokenizer.c with the system compiler into this package directory
(cached; ~1 s once per environment). Any failure — no compiler, readonly
filesystem, import error — silently yields None and the pure-Python
tokenizer runs alone. Set HTMLRAY_NO_CTOK=1 to force-disable.

Concurrent builds (e.g. many Ray workers importing at once) are serialized
with an fcntl lock and the compile lands via atomic rename, so a worker
never imports a half-written .so.
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys
import sysconfig

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "_ctokenizer.c")
_SO_NAME = "_ctokenizer" + (sysconfig.get_config_var("EXT_SUFFIX") or ".so")
_SO_PATH = os.path.join(_PKG_DIR, _SO_NAME)
_HASH_PATH = _SO_PATH + ".srchash"


def _src_hash() -> str:
    """Covers the .c source AND this loader (so compile-flag edits here
    invalidate the cached .so)."""
    import hashlib
    h = hashlib.md5()
    for path in (_SRC, os.path.abspath(__file__)):
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _so_is_current() -> bool:
    """The build is keyed on a source hash sidecar, so editing
    _ctokenizer.c triggers a rebuild instead of loading a stale .so."""
    if not os.path.exists(_SO_PATH):
        return False
    try:
        with open(_HASH_PATH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def _compile() -> bool:
    import fcntl
    lock_path = os.path.join(_PKG_DIR, ".ctok.lock")
    try:
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if _so_is_current():
                return True
            include = sysconfig.get_paths()["include"]
            tmp = _SO_PATH + f".tmp.{os.getpid()}"
            cmd = ["gcc", "-O3", "-fPIC", "-shared", f"-I{include}",
                   _SRC, "-o", tmp]
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=120)
            if res.returncode != 0:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                return False
            os.replace(tmp, _SO_PATH)  # atomic
            with open(_HASH_PATH, "w") as f:
                f.write(_src_hash())
            return True
    except Exception:
        return False


def load():
    """Returns the compiled module or None."""
    if os.environ.get("HTMLRAY_NO_CTOK"):
        return None
    try:
        if not _so_is_current():
            if not os.path.exists(_SRC) or not _compile():
                return None
        import importlib.util
        spec = importlib.util.spec_from_file_location("_ctokenizer", _SO_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # smoke check
        toks, pos, reason = mod.scan("a<b>c", 0, frozenset(), _noop_entity)
        assert pos == 5 and [t[0] for t in toks] == ["chars", "start",
                                                     "chars"], toks
        return mod
    except Exception:
        return None


def _noop_entity(s, pos):
    return ("&", pos + 1)
