"""Host CPU identity for the persistent-cache fingerprint — via CPUID.

Why not /proc/cpuinfo: on this VM fleet the guest can LIVE-MIGRATE between
hosts without a reboot.  /proc/cpuinfo is populated from boot-time CPU
detection and goes stale across such a migration, but LLVM's
``getHostCPUName``/``getHostCPUFeatures`` (which decide XLA:CPU codegen
tuning like ``+prefer-no-gather``) execute CPUID at *runtime* — so two
processes with identical /proc/cpuinfo can compile incompatible AOT
executables.  Observed 2026-08-18: a machine-feature-mismatch ERROR on a
warm read from the cache directory keyed by the /proc fingerprint
(deserializing such entries has SIGSEGV'd before; utils/xla_cache.py).

Reading CPUID directly gives the same identity LLVM sees.  Primary path:
``/dev/cpu/0/cpuid`` (pread at offset ``subleaf<<32 | leaf`` returns
eax,ebx,ecx,edx).  Fallback: a 26-byte CPUID thunk in RWX-mmapped memory.
Last resort: the /proc/cpuinfo digest (better than nothing).
"""

from __future__ import annotations

import hashlib
import struct

# (leaf, subleaf) pairs that determine codegen: vendor, family/model/
# stepping + base features, structured extended features (AVX512/AMX...),
# extended features, and the brand string
_LEAVES = (
    (0x0, 0),
    (0x1, 0),
    (0x7, 0),
    (0x7, 1),
    (0xD, 1),
    (0x80000001, 0),
    (0x80000002, 0),
    (0x80000003, 0),
    (0x80000004, 0),
)


def _cpuid_dev(leaf: int, subleaf: int) -> tuple[int, int, int, int] | None:
    try:
        with open("/dev/cpu/0/cpuid", "rb", buffering=0) as fh:
            import os

            raw = os.pread(fh.fileno(), 16, (subleaf << 32) | leaf)
        if len(raw) != 16:
            return None
        return struct.unpack("<4I", raw)
    except OSError:
        return None


_thunk = None


def _cpuid_shellcode(leaf: int, subleaf: int) -> tuple[int, int, int, int] | None:
    """CPUID via an executable thunk: fn(leaf, subleaf, out_ptr)."""
    global _thunk
    import ctypes
    import platform

    if platform.machine() != "x86_64":
        return None
    try:
        if _thunk is None:
            import mmap

            code = bytes(
                [
                    0x53,  # push rbx
                    0x89, 0xF8,  # mov eax, edi   (leaf)
                    0x89, 0xF1,  # mov ecx, esi   (subleaf)
                    0x49, 0x89, 0xD0,  # mov r8, rdx (out)
                    0x0F, 0xA2,  # cpuid
                    0x41, 0x89, 0x00,  # mov [r8], eax
                    0x41, 0x89, 0x58, 0x04,  # mov [r8+4], ebx
                    0x41, 0x89, 0x48, 0x08,  # mov [r8+8], ecx
                    0x41, 0x89, 0x50, 0x0C,  # mov [r8+12], edx
                    0x5B,  # pop rbx
                    0xC3,  # ret
                ]
            )
            buf = mmap.mmap(
                -1, len(code), prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC
            )
            buf.write(code)
            addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
            fn = ctypes.CFUNCTYPE(
                None, ctypes.c_uint32, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32)
            )(addr)
            _thunk = (buf, fn)  # keep the mapping alive with the callable
        out = (ctypes.c_uint32 * 4)()
        _thunk[1](leaf, subleaf, out)
        return tuple(out)
    except Exception:
        return None


def _proc_cpuinfo_digest() -> str:
    ident = []
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                key = line.split(":", 1)[0].strip()
                if key in {"flags", "model name", "model", "cpu family", "stepping"}:
                    ident.append(f"{key}=" + " ".join(sorted(line.split(":", 1)[1].split())))
                if line == "\n" and ident:
                    break
    except OSError:
        pass
    return "proc:" + "|".join(sorted(set(ident))) if ident else "nofeat"


def cpu_identity() -> str:
    """A string that changes iff the runtime-visible CPU identity changes."""
    words: list[str] = []
    for leaf, sub in _LEAVES:
        regs = _cpuid_dev(leaf, sub) or _cpuid_shellcode(leaf, sub)
        if regs is None:
            return _proc_cpuinfo_digest()
        words.append(f"{leaf:x}.{sub:x}:" + ",".join(f"{r:08x}" for r in regs))
    return "cpuid:" + "|".join(words)


def cpu_fingerprint() -> str:
    """Short stable hash of :func:`cpu_identity` for directory names."""
    return hashlib.sha256(cpu_identity().encode()).hexdigest()[:10]
