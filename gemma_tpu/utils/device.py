"""Per-chip peak numbers for roofline accounting.

One table shared by bench.py, the profiler and the CLI (the reference has
no equivalent — its only hardware knowledge is the pinned OpenCL device
name, `/root/reference/src/macro.h:25-26`)."""
from __future__ import annotations

# device_kind substring -> (HBM GB/s, peak bf16 FLOP/s)
_PEAKS = [
    ("v5 lite", (819.0, 197e12)),
    ("v5e", (819.0, 197e12)),
    ("v5p", (2765.0, 459e12)),
    ("v5", (2765.0, 459e12)),
    ("v4", (1228.0, 275e12)),
    ("v6", (1640.0, 918e12)),
    ("trillium", (1640.0, 918e12)),
]


def device_peaks() -> tuple[float, float]:
    """(HBM GB/s, peak FLOP/s) for the first visible device."""
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for sub, peaks in _PEAKS:
        if sub in kind:
            return peaks
    return (100.0, 1e12)  # CPU / unknown: nominal


def hbm_bandwidth_gbs() -> float:
    return device_peaks()[0]
