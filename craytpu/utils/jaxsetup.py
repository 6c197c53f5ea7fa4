"""Shared JAX runtime configuration.

Enables the persistent compilation cache (the integrator's bounce kernel is
expensive to compile on TPU) and provides helpers to query the platform.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    # Cap the CPU backend's ISA at AVX (no FMA3). XLA:CPU otherwise
    # contracts f32 mul+add chains into fma instructions, which lands
    # dot products up to ~450k ulp (at cancellation) away from the
    # TPU backend's IEEE sequential rounding; 50-bounce glass chains
    # amplify that into visible golden deviations (VERDICT r4 #1,
    # scripts/diag_dot3.py). Without FMA the CPU backend reproduces the
    # TPU backend's geometry math BIT-EXACTLY, so the CPU test suite is
    # representative of TPU behavior. Opt out with CRAYTPU_CPU_FMA=1
    # (e.g. if a jaxlib drop renames the flag — unknown XLA_FLAGS
    # abort the process).
    if os.environ.get("CRAYTPU_CPU_FMA", "") in ("", "0"):
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_cpu_max_isa" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_max_isa=AVX").strip()
    import jax
    # The axon TPU plugin ignores the JAX_PLATFORMS *env var*, so honor an
    # explicit platform request here via jax.config (CRAYTPU_PLATFORM=cpu is
    # how tests/tools pin themselves off the single shared TPU chip).
    plat = os.environ.get("CRAYTPU_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    # TPU matmuls/einsums default to bf16 products. The instance-space ray
    # transforms are einsums; at bf16 a transformed origin is off by ~1e-3
    # relative, which makes bounced rays SELF-INTERSECT spheres (measured:
    # 99.9% false re-hit rate on TPU, 0% on CPU) and darkens every sphere
    # scene several-fold. Geometry math must be f32; kernels that want bf16
    # (flash2's search) request it explicitly.
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:
        pass
    maybe_enable_debug()
    cache = cache_dir or os.environ.get(
        "CRAYTPU_CACHE", os.path.expanduser("~/.cache/craytpu-jax"))
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _CONFIGURED = True


def debug_enabled() -> bool:
    """CRAYTPU_DEBUG=1: the TPU analogue of the reference's opt-in
    ASan/UBSan builds (CMakeLists.txt:44-55). Read per call so tests can
    toggle it after import."""
    return os.environ.get("CRAYTPU_DEBUG", "") not in ("", "0")


def maybe_enable_debug() -> bool:
    """When CRAYTPU_DEBUG is set, turn on jax_debug_nans: a NaN in any
    jitted output re-runs the computation op-by-op and raises a LOCATED
    error (file/line of the producing op) instead of silently painting a
    black pixel. Transient masked NaNs inside the closest-hit search
    (padded det=0 slots) are by-design and don't trigger this — only a
    NaN that escapes into a step output does. The renderer additionally
    checkifies its bounce step (index + explicit invariant checks) when
    debug is on (wavefront_pt._jit)."""
    if not debug_enabled():
        return False
    import jax
    try:
        jax.config.update("jax_debug_nans", True)
    except Exception:
        pass
    return True
