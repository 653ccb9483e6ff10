"""Native host-math runtime (C++ over the system GMP ABI).

The reference does all big-integer math through libgmp via CGo
(reference: paillier.go:10 imports github.com/ncw/gmp).  Here the batched
data plane runs on TPU, and this module is the native *control plane*:
key-generation primality, safe-prime search (reference
safe_prime.go:61-266), modular inverses and gcds.

``hostmath.cpp`` is compiled lazily on first import (g++, linked directly
against the system ``libgmp.so.10`` — no GMP headers needed) and loaded
with ctypes.  Everything degrades gracefully: if the toolchain or libgmp
is missing, ``available()`` returns False and callers fall back to the
pure-Python implementations in :mod:`paillier_tpu.bigint.host`.

Set ``PAILLIER_TPU_NO_NATIVE=1`` to force the Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostmath.cpp")
_SO = os.path.join(_HERE, "_hostmath.so")
_GMP_CANDIDATES = (
    "/usr/lib/x86_64-linux-gnu/libgmp.so.10",
    "/lib/x86_64-linux-gnu/libgmp.so.10",
    "/usr/lib/libgmp.so.10",
    "/usr/lib/x86_64-linux-gnu/libgmp.so",
)

_lib = None
_lock = threading.Lock()
_tried = False


def _find_gmp() -> Optional[str]:
    for p in _GMP_CANDIDATES:
        if os.path.exists(p):
            return p
    return None


def _build() -> bool:
    gmp = _find_gmp()
    if gmp is None:
        return False
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return True
    tmp = _SO + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, gmp,
           "-lpthread", "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        print(f"# paillier_tpu.native: build failed ({e}); "
              "using Python fallback", file=sys.stderr)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PAILLIER_TPU_NO_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            print(f"# paillier_tpu.native: load failed ({e})",
                  file=sys.stderr)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        sz = ctypes.c_size_t
        lib.pt_abi_version.restype = ctypes.c_int
        lib.pt_powm.argtypes = [u8p, sz, u8p, sz, u8p, sz, u8p]
        lib.pt_powm_batch.argtypes = [u8p, sz, sz, u8p, sz, u8p, sz, u8p,
                                      ctypes.c_int]
        lib.pt_probab_prime.argtypes = [u8p, sz, ctypes.c_int]
        lib.pt_probab_prime.restype = ctypes.c_int
        lib.pt_invert.argtypes = [u8p, sz, u8p, sz, u8p]
        lib.pt_invert.restype = ctypes.c_int
        lib.pt_gcd.argtypes = [u8p, sz, u8p, sz, u8p, sz]
        lib.pt_mulmod.argtypes = [u8p, sz, u8p, sz, u8p, sz, u8p]
        lib.pt_safe_prime.argtypes = [ctypes.c_uint, ctypes.c_ulong,
                                      ctypes.c_double, ctypes.c_int, u8p, sz]
        lib.pt_safe_prime.restype = ctypes.c_int
        lib.pt_random_prime.argtypes = [ctypes.c_uint, ctypes.c_ulong,
                                        ctypes.c_int, u8p, sz]
        lib.pt_random_prime.restype = ctypes.c_int
        if lib.pt_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _be(x: int, length: Optional[int] = None) -> bytes:
    if length is None:
        length = max(1, (x.bit_length() + 7) // 8)
    return x.to_bytes(length, "big")


def _buf(data: bytes):
    return (ctypes.c_uint8 * len(data)).from_buffer_copy(data)


def _out(length: int):
    return (ctypes.c_uint8 * length)()


def powm(base: int, exp: int, mod: int) -> int:
    """base^exp mod mod (exp >= 0, mod > 0)."""
    lib = _load()
    b, e, m = _be(base), _be(exp), _be(mod)
    out = _out(len(m))
    lib.pt_powm(_buf(b), len(b), _buf(e), len(e), _buf(m), len(m), out)
    return int.from_bytes(bytes(out), "big")


def powm_batch(bases, exp: int, mod: int, threads: int = 0) -> list:
    """[b^exp mod mod for b in bases], multithreaded."""
    lib = _load()
    m = _be(mod)
    ml = len(m)
    stride = max(ml, max((b.bit_length() + 7) // 8 for b in bases))
    flat = b"".join(_be(b, stride) for b in bases)
    out = _out(ml * len(bases))
    threads = threads or min(len(bases), os.cpu_count() or 1)
    lib.pt_powm_batch(_buf(flat), len(bases), stride, _buf(_be(exp)),
                      len(_be(exp)), _buf(m), ml, out, threads)
    raw = bytes(out)
    return [int.from_bytes(raw[i * ml:(i + 1) * ml], "big")
            for i in range(len(bases))]


def is_probable_prime(n: int, reps: int = 20) -> bool:
    """GMP probab_prime (BPSW + reps Miller-Rabin rounds)."""
    if n < 2:
        return False
    lib = _load()
    x = _be(n)
    return lib.pt_probab_prime(_buf(x), len(x), reps) > 0


def modinv(a: int, m: int) -> int:
    lib = _load()
    ab, mb = _be(a % m if a >= 0 else a % m), _be(m)
    out = _out(len(mb))
    ok = lib.pt_invert(_buf(ab), len(ab), _buf(mb), len(mb), out)
    if not ok:
        raise ValueError("base is not invertible for the given modulus")
    return int.from_bytes(bytes(out), "big")


def gcd(a: int, b: int) -> int:
    lib = _load()
    ab, bb = _be(a), _be(b)
    outl = max(len(ab), len(bb))
    out = _out(outl)
    lib.pt_gcd(_buf(ab), len(ab), _buf(bb), len(bb), out, outl)
    return int.from_bytes(bytes(out), "big")


def mulmod(a: int, b: int, m: int) -> int:
    lib = _load()
    ab, bb, mb = _be(a), _be(b), _be(m)
    out = _out(len(mb))
    lib.pt_mulmod(_buf(ab), len(ab), _buf(bb), len(bb), _buf(mb), len(mb),
                  out)
    return int.from_bytes(bytes(out), "big")


def safe_prime(bits: int, seed: int, timeout: float = 120.0,
               threads: int = 0) -> Optional[Tuple[int, int]]:
    """(p, q) with p = 2q+1 both prime, p of exactly ``bits`` bits, or
    None on timeout.  Deterministic per (seed, threads)."""
    lib = _load()
    outl = (bits + 7) // 8
    out = _out(outl)
    threads = threads or (os.cpu_count() or 1)
    r = lib.pt_safe_prime(bits, seed & ((1 << 64) - 1), timeout, threads,
                          out, outl)
    if r != 1:
        return None
    p = int.from_bytes(bytes(out), "big")
    return p, (p - 1) // 2


def random_prime(bits: int, seed: int, congruent_3_mod_4: bool = False
                 ) -> int:
    """Random prime of exactly ``bits`` bits; deterministic per seed."""
    lib = _load()
    outl = (bits + 7) // 8
    out = _out(outl)
    r = lib.pt_random_prime(bits, seed & ((1 << 64) - 1),
                            int(congruent_3_mod_4), out, outl)
    if r != 1:
        raise RuntimeError("native random_prime failed")
    return int.from_bytes(bytes(out), "big")
