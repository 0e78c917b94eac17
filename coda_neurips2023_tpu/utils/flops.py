"""XLA-derived FLOP/byte accounting -> MFU / HBM-utilization roofline.

BASELINE.md's per-op budgets never stated achieved FLOP/s against the chip
peak, so "is it actually fast" rested on relative deltas alone.  This module
closes that: FLOP and HBM-byte counts come from the compiled executable's own
``cost_analysis()`` (XLA's static accounting over the *optimized* HLO — after
fusion, so bytes reflect what actually moves through HBM), not hand-derived
formulas, so they track the code as it changes.

Peaks are the published v5e (TPU v5 lite) per-chip numbers: 197 TFLOP/s bf16
(fp32 matmuls run as 1-pass bf16 on the MXU under default precision — see
BASELINE.md round-2 notes) and 819 GB/s HBM.  The detector eval path is
gather/VPU-bound by protocol (ball query + group gather dominate; see the
roofline analysis in BASELINE.md), so a LOW MXU MFU there is expected and the
HBM-utilization figure is the honest headroom statement; the CLIP tower is
the matmul-heavy component where MFU is meaningful.

Reference anchor: the reference prints only wall-clock + memory
(/root/reference/engine.py:210-217) and never any FLOP accounting.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

# Published TPU v5e per-chip peaks.
V5E_PEAK_BF16_FLOPS = 197e12  # MXU, bf16 (and default-precision f32) FLOP/s
V5E_HBM_BYTES_PER_S = 819e9


def compiled_costs(jitted_fn, *args, **kwargs) -> Optional[Dict[str, float]]:
    """FLOPs + HBM bytes of the optimized executable for these arg shapes.

    ``jitted_fn`` must be a ``jax.jit`` product (has ``.lower``).  Returns
    ``{"flops": F, "bytes": B}`` or None when the backend/wrapper does not
    expose a cost analysis (e.g. non-jit callables, exotic plugins).
    """
    lower = getattr(jitted_fn, "lower", None)
    if lower is None:
        return None
    try:
        analysis = lower(*args, **kwargs).compile().cost_analysis()
    except Exception:
        return None
    if isinstance(analysis, (list, tuple)):  # older PJRT returns [dict]
        analysis = analysis[0] if analysis else None
    if not analysis:
        return None
    flops = float(analysis.get("flops", 0.0))
    bytes_accessed = float(analysis.get("bytes accessed", 0.0))
    if flops <= 0.0 and bytes_accessed <= 0.0:
        return None
    return {"flops": flops, "bytes": bytes_accessed}


def roofline(
    costs: Optional[Dict[str, float]],
    seconds: float,
    peak_flops: float = V5E_PEAK_BF16_FLOPS,
    peak_bytes_per_s: float = V5E_HBM_BYTES_PER_S,
) -> Dict[str, Any]:
    """Achieved TFLOP/s + MFU and HBM GB/s + utilization for one execution.

    MFU here is *model* FLOP utilization in the XLA sense: optimized-HLO
    FLOPs / wall-clock / chip peak.  Returns {} when costs are unavailable
    (keeps JSON emitters clean on CPU test runs).
    """
    if not costs or seconds <= 0.0:
        return {}
    tflops = costs["flops"] / seconds / 1e12
    gbps = costs["bytes"] / seconds / 1e9
    return {
        "tflops_per_s": round(tflops, 3),
        "mfu": round(costs["flops"] / seconds / peak_flops, 4),
        "hbm_gb_per_s": round(gbps, 1),
        "hbm_util": round(costs["bytes"] / seconds / peak_bytes_per_s, 4),
    }


def roofline_str(costs, seconds) -> str:
    r = roofline(costs, seconds)
    if not r:
        return "roofline: n/a (no cost analysis on this backend)"
    return (
        f"roofline: {r['tflops_per_s']:.2f} TFLOP/s ({100 * r['mfu']:.1f}% of"
        f" v5e bf16 peak), HBM {r['hbm_gb_per_s']:.0f} GB/s"
        f" ({100 * r['hbm_util']:.1f}% of 819 GB/s)"
    )
