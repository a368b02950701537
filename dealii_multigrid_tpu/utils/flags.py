"""Shape-conditional parsing for the lane-dense engine variant flags.

The round-3c variants (DESIGN.md: patch-minor stencil, whole-row
singletons, transposed exchange/transfer) trade the (8, 128) tile-padding
tax for extra data movement, so whether each wins depends on the level
SHAPE (patch count on the lanes, singleton population).  The production
flags therefore accept, besides plain "0"/"1", shape conditions evaluated
per operator/transfer build:

    MGTPU_TSTENCIL="np>=256"        # on for levels with >= 256 patches
    MGTPU_ROW_SINGLE="ns>=4096"     # on where singletons dominate
    MGTPU_TTRANSFER="np>=256,nc>=64"  # OR-joined clauses

Keys: np = patch count (fine side for transfers), ns = singleton count,
nc = coarse-side patch count (transfers only).  This keeps the per-level
flag policy a pure configuration decision once the TPU measurements pick
the winners (RESULTS.md round-3c).
"""

from __future__ import annotations

import os
import re

_COND = re.compile(r"^(np|nc|ns)\s*(>=|<=|>|<)\s*(\d+)$")

# Measured production defaults (env still overrides — set the var to "0" to
# force a variant off, "1" to force it on everywhere).  Populated from the
# round-4 TPU measurement session (/tmp/measure3d.log 2026-08-18, recorded in
# RESULTS.md): every variant wins or ties at every measured shape —
#   r=7/p=4 L7 (NP=512, NS=7854, no cross):  vmult 27.6 -> 26.5 ms
#   r=7/p=4 L6 (NP=64, NS=7854, cross):      vmult 10.5 -> 6.8 ms
#   LS r=6/p=4 V-cycle (7 level meshes):     86.0 -> 83.0 ms
#   L6->L7 transfers: restrict 14.7 -> 11.4, prolong 8.8 -> 5.8 ms
# The unmeasured coarser levels are sub-ms either way, so the policy is a
# plain "on" rather than a pseudo-precise shape condition.
DEFAULT_POLICY: dict[str, str] = {
    "MGTPU_TSTENCIL": "1",
    "MGTPU_ROW_SINGLE": "1",
    "MGTPU_TEXCHANGE": "1",
    "MGTPU_TTRANSFER": "1",
    # transposed-vmult pipeline (single transpose in/out, permuted tables):
    # measured 17.75 vs 22.3 ms all-variant at r=7/p=4 L7 (NP=512), but
    # 6.5 vs 5.1 at L6 (NP=64, lanes half-empty + transpose overhead) —
    # lane-dense pays when the patch count fills the 128 lanes
    "MGTPU_TV": "np>=256",
    # one-hot-GEMM boundary transposes for tv mode (to_t/from_t as exact
    # [NP, NP] one-hot GEMMs on the MXU): measured OFF — at the production
    # shape (L7, NP=512, S=33) to_t[gemm] 2.32 ms vs 1.85 ms XLA transpose,
    # full vmult 18.4 vs 17.5 (profile_tv 2026-08-18); only wins at NP=64
    # where tv mode itself is off
    "MGTPU_TGEMM": "",
    # adaptive per-level patch granularity: halve K on coarser levels until
    # the level has >= this many patches, so the lane-dense tv pipeline
    # engages below the finest level (api.choose_level_ks; the transfer
    # supports K_coarse in {K_fine, K_fine/2}).  Value = target NP, "0" off.
    # TPU-measured at r=7/p=4 (level Ks 8/4/2/...): L6 vmult 7.57 -> 6.36,
    # L5 2.23 -> 1.03, restrict fine 8.62 -> 6.68, V-cycle 176.6 -> 145.5 ms
    # (profile_r7 2026-08-18, MGTPU_KADAPT=256)
    "MGTPU_KADAPT": "256",
    # LS copy_to/from_mg as row-structured copies (matched patches copy as
    # whole contiguous [S^3] rows, singletons as [nloc] rows; element
    # leftovers only for bucket-mismatched cells).  The flat element tables
    # measured as ~70 of the 72 ms LS V-cycle at r=6/p=4; TPU A/B on the
    # full HMG-local solve (r=6/p=4, 2026-08-19): 0.519 s -> 0.246 s
    # (17.8 -> 37.5 MDoF/s), 4 iterations both, vs HMG-global 0.143 s in
    # the same session — LS lands within 1.3x of GC
    "MGTPU_LS_ROWCOPY": "1",
    # chunked-chain outer CG for GC solves: first-chunk length k0 (iterations
    # unrolled in ONE program with the convergence test masked in; leftovers
    # one per dispatch), "0"/"" = monolithic lax.while_loop.  Round-4c
    # probe_cg_loop measured the while_loop paying ~170 ms FIXED over the
    # identical chain at r=7/p=4 (chain t(3)=579 ms vs while t(3)=736 ms,
    # same ~180 ms/iteration); the benchmark family converges in 3.
    # TPU-measured with the deal.II CG ordering (2026-08-19 A/B): float
    # 0.736 -> 0.614 s (71.6 -> 85.8 MDoF/s), df32 0.740 -> 0.582 s
    # (71.1 -> 90.5), mixed 2.90 -> 2.75 s; 3 iterations everywhere,
    # recomputed-residual guard clean.  Oversized k0 never changes results
    # (masked steps), so the family-wide k0=3 is safe for configs that
    # converge in fewer iterations and merely suboptimal for more.
    "MGTPU_GC_CHAIN": "3",
    # chunked-chain CG for the LS (HMG-local/HPMG-local) outer solve: the
    # masked unrolled chain is a DIFFERENT program shape from the
    # while_loop whose LS V-cycle miscompile forced the host-loop
    # workaround — and it compiles correctly (recomputed-residual guard
    # clean on chip).  Same-session A/B at quadrant r=6/p=4 (2026-08-19):
    # host-loop 0.1839 s / 37.6 MDoF/s -> chain 0.1334 s / 51.9 MDoF/s,
    # 3 iterations both — the LS/GC gap closes to ~1x.  "0" falls back to
    # the host loop on accelerators (never the while_loop).  k0 retuned
    # 4 -> 3 (round-4j A/B under the ROWSF+TVCYCLE pipeline, 2026-08-20):
    # LS converges in 3 at the bench configs, so the masked 4th iteration
    # burned one V-cycle — chain k0=3 0.1070 s / 64.6 MDoF/s vs k0=4
    # 0.1618 / 42.7 at r=6/p=4, results provably unchanged (masked-freeze
    # + recomputed-residual guard).  CAVEAT (round-4 advisor): that A/B's
    # "host-loop 0.1493 / 46.3" arm popped the env var, which falls back
    # to this DEFAULT_POLICY — it actually measured chain k0=4 again.  The
    # GENUINE host loop (probe arm pinning "0", 2026-08-20): 0.2143 s /
    # 32.3 MDoF/s vs chain k0=3 0.1212 s / 57.0 — chain wins 1.77x.
    "MGTPU_LS_CHAIN": "3",
    # dense-plane structured patch faces in tv mode (one blended strided-slab
    # update / one slab read per (d, side) per round, one-hot patch routing,
    # instead of element-priced flat face tables): TPU-measured at r=7/p=4
    # L7 vmult 17.58 -> 15.41 ms in context, neutral at L6 (profile_tv
    # 2026-08-18) — the win is XLA fusing the slab ops into the pipeline,
    # not the isolated stage times
    "MGTPU_TCFACES": "1",
    # split-state (TVec) transposed vmult: the patch and singleton buckets
    # ride the whole pipeline as separate leaves — constraint scatters cost
    # the bucket they live in (census_rounds.py: every element-priced table
    # at bench shapes is tail-resident, 4 MB vs the 78 MB fused volume) and
    # the per-stage split/concat repacks vanish.  TPU-measured in context
    # (probe_tsplit_vcycle, r=7/p=4, one build, 2026-08-19): V-cycle 165.3
    # -> 155.9 ms, PCG step 179.0 -> 170.2 ms (-5%); stage-level the L7
    # smoother step is the main win (29.1 -> 26.7 ms, profile_tsplit).
    # Algebra exactness-tested vs the flat tv pipeline in CI and on chip
    # (consistent input 4.9e-8 f32).
    "MGTPU_TSPLIT": "1",
    # row-form singleton structured faces inside the split pipeline: each
    # face moves as its cell's whole [nloc] block row + one-hot plane-
    # selection GEMMs instead of element-priced flat tables (block rows
    # ~4 ns/ROW vs ~7.7 ns/ELEMENT; profile_l6 prices the element tables
    # at 1.83 + 1.93 ms of the 6.9 ms L6 vmult, and the same tables recur
    # at every patch level).  TPU-measured (probe_rowsf_tvcycle, r=7/p=4,
    # one build, 2026-08-20): V-cycle 156.9 -> 116.4 ms (-26%); exact on
    # consistent input (2.6e-7 f32) vs the element tables, on chip and CI.
    "MGTPU_ROWSF": "1",
    # T-state V-cycle: every eligible level visit runs in the split (TVec)
    # layout with ONE to/from_ts pair instead of boundary transposes around
    # each smoother call, residual vmult and transfer (~7 volume transposes
    # per hot-level visit, ~1.6-2.0 ms each at L7).  TPU-measured on top of
    # rowsf (probe_rowsf_tvcycle, 2026-08-20): V-cycle 116.4 -> 104.3 ms,
    # PCG step 171.7 -> 106.6 ms (-38% vs round-4h production); exact on
    # consistent input (2.6e-7) on chip and in CI.
    "MGTPU_TVCYCLE": "1",
}


def pin_policy_env(setenv, force_shape_conditional: bool = True) -> None:
    """Pin the SHIPPED DEFAULT_POLICY through env vars (CI helper).

    The CPU backend ignores policy defaults (no tile-padding tax), so the
    production-pipeline tests must pin values through env — and they must
    pin THESE values, not hand-copied ones that can silently diverge from
    what ships (round-4: a test pinned MGTPU_LS_CHAIN=4 while the policy
    shipped "3").  ``setenv`` is e.g. pytest's monkeypatch.setenv.

    ``force_shape_conditional=True`` (the default for tests) rewrites
    shape-conditional values ("np>=256") and the adaptive-K target to
    engage at tiny CI shapes — otherwise the conditioned paths would
    silently self-disable and the test would cover nothing.
    """
    for k, v in DEFAULT_POLICY.items():
        if force_shape_conditional and any(
            dim in v for dim in ("np", "nc", "ns")
        ):
            v = "1"
        setenv(k, v)


def kadapt_target() -> int:
    """Lane-density patch-count target for adaptive per-level K (0 = off).

    MGTPU_KADAPT env overrides everywhere (tests force it on the CPU
    backend); unset falls back to DEFAULT_POLICY on non-CPU platforms only,
    like the lane-dense variant flags (the CPU backend has no (8, 128) tile
    to fill, and the adaptive layouts would only slow its test suite)."""
    val = os.environ.get("MGTPU_KADAPT")
    if val is None:
        import jax

        try:
            plats = jax.config.jax_platforms or ""
        except Exception:  # pragma: no cover - config field unavailable
            plats = ""
        if plats.startswith("cpu"):
            return 0
        val = DEFAULT_POLICY.get("MGTPU_KADAPT", "0")
    val = val.strip()
    return int(val) if val else 0


def _chain_k(env_name: str) -> int:
    """Chunked-chain outer-CG first-chunk length (0 = construct default).

    The env var overrides everywhere; unset falls back to DEFAULT_POLICY
    on non-CPU platforms only (the fixed while_loop cost and the LS
    host-loop dispatch tax are axon-TPU artifacts; the CPU test suite
    keeps the one-program paths)."""
    val = os.environ.get(env_name)
    if val is None:
        import jax

        try:
            plats = jax.config.jax_platforms or ""
        except Exception:  # pragma: no cover - config field unavailable
            plats = ""
        if plats.startswith("cpu"):
            return 0
        val = DEFAULT_POLICY.get(env_name, "0")
    val = val.strip()
    return int(val) if val else 0


def gc_chain_k() -> int:
    return _chain_k("MGTPU_GC_CHAIN")


def ls_chain_k() -> int:
    return _chain_k("MGTPU_LS_CHAIN")


def variant_flag(env_name: str, **dims) -> bool:
    """Evaluate a variant flag for an operator with the given dimensions.

    Unset falls back to the measured DEFAULT_POLICY; "" and "0" mean off;
    "1" means on everywhere; otherwise the value is a comma-separated (OR)
    list of conditions ``{np|nc|ns} {>=, <=, >, <} N`` checked against
    ``dims``.  Unknown dimension keys in a condition make that clause false
    (so one policy string can serve both operators and transfers).
    Malformed syntax raises ValueError rather than silently running the
    wrong engine.
    """
    val = os.environ.get(env_name)
    if val is None:
        # DEFAULT_POLICY holds TPU-measured winners; the CPU backend has no
        # (8, 128) tile-padding tax, so policy defaults (unlike explicit env
        # settings) do not apply when the process forces the CPU platform
        # (tests, virtual-mesh dryruns).  Checked via the config value, not
        # default_backend(), to avoid triggering remote backend init.
        import jax

        try:
            plats = jax.config.jax_platforms or ""
        except Exception:  # pragma: no cover - config field unavailable
            plats = ""
        if plats.startswith("cpu"):
            return False
        val = DEFAULT_POLICY.get(env_name, "")
    val = val.strip()
    if val in ("", "0"):
        return False
    if val == "1":
        return True
    for clause in val.split(","):
        m = _COND.match(clause.strip())
        if m is None:
            raise ValueError(
                f"{env_name}: bad variant-flag clause {clause!r} "
                "(want 0, 1, or e.g. 'np>=256')"
            )
        key, op, num = m.group(1), m.group(2), int(m.group(3))
        x = dims.get(key)
        if x is None:
            continue
        if (
            (op == ">=" and x >= num)
            or (op == "<=" and x <= num)
            or (op == ">" and x > num)
            or (op == "<" and x < num)
        ):
            return True
    return False
