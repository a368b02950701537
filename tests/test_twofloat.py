"""Double-single (f32x2) compensated outer CG: exactness + parity tests.

The df32 number type must reproduce the NumberType=mixed boundary
(f64-quality Krylov recursion around f32 operator applications,
multigrid_throughput.cc:2430-2433) without any f64 on the device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_multigrid_tpu.solvers import twofloat as tf
from dealii_multigrid_tpu.solvers.cg import cg_solve


def _rand(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * scale).astype(np.float32)


def test_two_sum_exact():
    a = jnp.asarray(_rand(4096, 1))
    b = jnp.asarray(_rand(4096, 2, scale=1e-4))
    s, e = tf.two_sum(a, b)
    # the pair (s, e) represents a+b EXACTLY: verify in f64
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    assert np.array_equal(lhs, rhs)


def test_two_prod_exact():
    a = jnp.asarray(_rand(4096, 3))
    b = jnp.asarray(_rand(4096, 4))
    p, e = tf.two_prod(a, b)
    # f32*f32 is exact in f64, so the pair must match the f64 product bitwise
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    assert np.array_equal(lhs, rhs)


def test_split_roundtrip_and_axpy_accuracy():
    rng = np.random.default_rng(7)
    x64 = rng.standard_normal(2048)
    pair = tf.tf_split_f64_host(x64)
    # a double-single pair carries ~49 mantissa bits: the roundtrip is
    # near-exact (2^-49 relative), not bitwise
    rt = np.asarray(tf.tf_to_f64(pair))
    assert np.max(np.abs(rt - x64) / np.maximum(np.abs(x64), 1e-30)) < 2**-45

    p64 = rng.standard_normal(2048)
    ppair = tf.tf_split_f64_host(p64)
    alpha = np.float32(0.37281)
    out = tf.tf_axpy(alpha, ppair, pair)
    ref = x64 + np.float64(alpha) * p64
    err = np.max(np.abs(np.asarray(tf.tf_to_f64(out)) - ref)) / np.max(np.abs(ref))
    # double-single axpy keeps ~47+ effective bits
    assert err < 1e-13


def test_accumulated_axpy_chain_beats_f32():
    # 200 accumulation steps: plain f32 drifts at ~1e-5, the pair stays ~1e-12
    rng = np.random.default_rng(11)
    n, steps = 1024, 200
    x64 = np.zeros(n)
    xf32 = jnp.zeros(n, jnp.float32)
    xtf = tf.tf_zeros_like(xf32)
    for k in range(steps):
        v = rng.standard_normal(n).astype(np.float32)
        a = np.float32(rng.uniform(-1, 1))
        x64 = x64 + np.float64(a) * v.astype(np.float64)
        xf32 = xf32 + a * jnp.asarray(v)
        xtf = tf.tf_axpy_f32(a, jnp.asarray(v), xtf)
    scale = np.max(np.abs(x64))
    err_tf = np.max(np.abs(np.asarray(tf.tf_to_f64(xtf)) - x64)) / scale
    err_f32 = np.max(np.abs(np.asarray(xf32, np.float64) - x64)) / scale
    assert err_tf < 1e-11
    assert err_tf < err_f32 / 100.0


def test_compensated_dot_accuracy():
    rng = np.random.default_rng(13)
    a64 = rng.standard_normal(1 << 16)
    b64 = rng.standard_normal(1 << 16)
    apair, bpair = tf.tf_split_f64_host(a64), tf.tf_split_f64_host(b64)
    got = float(tf.tf_dot(apair, bpair))
    ref = float(a64 @ b64)
    assert abs(got - ref) / max(abs(ref), np.linalg.norm(a64) * np.linalg.norm(b64) * 1e-3) < 1e-5


def test_cg_df32_matches_f64_iterations_tight_tol():
    """SPD system solved to rtol 1e-10: the double-single CG must track the
    f64-vector CG iteration-for-iteration (same matvec precision boundary:
    the operator itself applies in f32 in both)."""
    rng = np.random.default_rng(17)
    n = 400
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.geomspace(1.0, 2.0e3, n)  # kappa 2e3
    a64 = (q * lam) @ q.T
    a32 = jnp.asarray(a64, jnp.float32)
    b64 = rng.standard_normal(n)

    vmult32 = lambda v: a32 @ v
    diag32 = jnp.asarray(np.diag(a64), jnp.float32)
    prec32 = lambda r: r / diag32

    # reference: f64 Krylov vectors around the SAME f32 matvec (the
    # NumberType=mixed semantics)
    vmult_mixed = lambda v: (a32 @ v.astype(jnp.float32)).astype(jnp.float64)
    prec_mixed = lambda r: (r.astype(jnp.float32) / diag32).astype(jnp.float64)
    ref = cg_solve(
        vmult_mixed, jnp.asarray(b64, jnp.float64),
        preconditioner=prec_mixed, reltol=1e-10, maxiter=2000,
    )

    got = tf.cg_solve_df32(
        vmult32, tf.tf_split_f64_host(b64),
        preconditioner=prec32, reltol=1e-10, maxiter=2000,
    )

    it_ref, it_got = int(ref.n_iterations), int(got.n_iterations)
    assert bool(got.converged)
    assert abs(it_got - it_ref) <= max(2, it_ref // 10), (it_got, it_ref)

    x_ref = np.asarray(ref.x, np.float64)
    x_got = np.asarray(tf.tf_to_f64(got.x))
    rel = np.linalg.norm(x_got - x_ref) / np.linalg.norm(x_ref)
    # both floored by the f32 matvec; they must agree at that floor
    assert rel < 5e-5, rel


def test_cg_df32_reaches_below_f32_floor():
    """At rtol 1e-10 a pure-f32 CG stalls well above tolerance on an
    ill-conditioned system; df32 must actually converge (the recursion is
    the bottleneck it removes).  Uses an exact (dense f32) matvec with
    kappa ~ 1e2 so the matvec floor sits below the target."""
    rng = np.random.default_rng(23)
    n = 300
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.geomspace(1.0, 1.0e2, n)
    a64 = (q * lam) @ q.T
    a32 = jnp.asarray(a64, jnp.float32)
    b64 = rng.standard_normal(n)

    vmult32 = lambda v: a32 @ v
    got = tf.cg_solve_df32(
        vmult32, tf.tf_split_f64_host(b64), reltol=1e-9, maxiter=3000,
    )
    assert bool(got.converged)
    # verify the TRUE residual in f64, not just the recursion's claim; the
    # floor is set by the f32 MATVEC (eps32 * ||A|| * ||x||), not the
    # recursion — assert we sit at that floor
    x = np.asarray(tf.tf_to_f64(got.x))
    r = b64 - np.asarray(a32, np.float64) @ x
    rel_true = np.linalg.norm(r) / np.linalg.norm(b64)
    assert rel_true < 2e-6, rel_true

    # a plain-f32 CG at the same tolerance cannot do better: its recursion
    # stalls at the f32 floor (it runs out the iteration budget or stops
    # with a worse true residual)
    f32res = cg_solve(
        vmult32, jnp.asarray(b64, jnp.float32), reltol=1e-9, maxiter=3000,
    )
    xf = np.asarray(f32res.x, np.float64)
    rel_f32 = np.linalg.norm(b64 - np.asarray(a32, np.float64) @ xf) / np.linalg.norm(b64)
    assert rel_true <= rel_f32 * 1.5, (rel_true, rel_f32)
    assert (not bool(f32res.converged)) or rel_f32 > rel_true


def _params(typ, r, p=2, number="df32", reltol=1e-8):
    from dealii_multigrid_tpu.utils.params import RunParameters

    prm = RunParameters()
    prm.type = typ
    prm.geometry_type = "quadrant"
    prm.n_ref_global = r
    prm.fe_degree_fine = p
    prm.number_type = number
    prm.mg_number_type = "float"
    prm.mg_data.coarse_solver.type = "amg"
    prm.mg_data.smoother.degree = 3
    prm.mg_data.cg_normal.reltol = reltol
    prm.mg_data.n_repetitions = 1
    return prm


def test_api_df32_matches_mixed():
    """NumberType=df32 must reproduce NumberType=mixed (f64 outer around f32
    levels) at a tight tolerance: same iterations, same solution to the f32
    matvec floor — the reference's run<3,1,double,float> boundary
    (multigrid_throughput.cc:2430-2433) without device f64."""
    from dealii_multigrid_tpu import api

    res_m, prob_m, _ = api.run(_params("HMG-global", 3, number="mixed"))
    res_d, prob_d, _ = api.run(_params("HMG-global", 3, number="df32"))
    assert res_m.converged and res_d.converged
    assert abs(res_m.n_iterations - res_d.n_iterations) <= 1, (
        res_m.n_iterations,
        res_d.n_iterations,
    )
    xm = np.asarray(res_m.x, np.float64)
    xd = np.asarray(res_d.x, np.float64)
    rel = np.linalg.norm(xd - xm) / np.linalg.norm(xm)
    assert rel < 1e-5, rel


def test_api_df32_gaussian_l2_error_at_f64_level():
    """With x64 available at setup, the df32 RHS is assembled in f64 and
    split exactly: the L2 error must land at the mixed-mode (discretisation)
    level, not the f32 RHS-assembly floor."""
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.models import poisson as P

    errs = {}
    for number in ("mixed", "df32"):
        prm = _params("HMG-global", 4, number=number)
        prm.simulation_type = "Gaussian"
        res, prob, _ = api.run(prm)
        u = prob.full_solution(res.x.astype(jnp.float64))
        errs[number] = float(P.l2_error(prob, u))
    assert errs["df32"] < 1.3 * errs["mixed"], errs


def test_api_df32_local_smoothing():
    from dealii_multigrid_tpu import api

    res_m, _, _ = api.run(_params("HMG-local", 3, number="mixed"))
    res_d, _, _ = api.run(_params("HMG-local", 3, number="df32"))
    assert res_d.converged
    assert abs(res_d.n_iterations - res_m.n_iterations) <= 1, (
        res_d.n_iterations,
        res_m.n_iterations,
    )


def test_df32_host_loop_matches_while_loop():
    """The host-loop df32 CG (one jitted step per iteration — the LS/axon
    miscompile workaround) must match the while_loop df32 CG."""
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.models import poisson
    from dealii_multigrid_tpu.ops import hybrid as hy
    from dealii_multigrid_tpu.ops.operator import make_operator
    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG

    prm = _params("HMG-global", 3, number="df32")
    res, prob, levels = api.solve_with_global_coarsening_hybrid(
        prm, G.create("quadrant", 3, prm.n_ref_global, prm.n_ref_local)
    )
    fine = levels[-1]
    rhs_op = hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float64)
    gop = make_operator(fine.dofh, fine.hanging, dtype=jnp.float64, device=False)
    _, rhs64 = poisson.assemble_problem_hybrid(
        fine.dofh, fine.hanging, rhs_op, hy.cell_slot_table(fine.fmt),
        fine.fmt, gop, prm.simulation_type,
    )
    b = tf.tf_split_f64_host(np.asarray(rhs64, np.float64))
    precond = PreconditionMG(res.mg, jnp.float32)
    res_host = api.mg_solve(
        fine.op, b, precond, prm.mg_data, n_levels=res.n_levels,
        dot=True, n_dofs=fine.dofh.n_dofs, host_loop=True, df32=True,
        warmup=False,
    )
    assert res_host.converged
    assert abs(res_host.n_iterations - res.n_iterations) <= 1
    xa = np.asarray(fine.to_global(res_host.x), np.float64)
    xb = np.asarray(res.x, np.float64)
    assert np.linalg.norm(xa - xb) / np.linalg.norm(xb) < 1e-5


def test_df32_chain_matches_while_loop():
    """The chunked-chain df32 CG (round-4c while_loop fixed-cost fix) must
    match the while_loop df32 CG: identical iteration count, same solution,
    across k0 below/at/above the iteration count."""
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators as G
    from dealii_multigrid_tpu.models import poisson
    from dealii_multigrid_tpu.ops import hybrid as hy
    from dealii_multigrid_tpu.ops.operator import make_operator
    from dealii_multigrid_tpu.solvers.multigrid import PreconditionMG

    prm = _params("HMG-global", 3, number="df32")
    res, prob, levels = api.solve_with_global_coarsening_hybrid(
        prm, G.create("quadrant", 3, prm.n_ref_global, prm.n_ref_local)
    )
    fine = levels[-1]
    rhs_op = hy.make_hybrid_operator(fine.fmt, fine.hanging, dtype=jnp.float64)
    gop = make_operator(fine.dofh, fine.hanging, dtype=jnp.float64, device=False)
    _, rhs64 = poisson.assemble_problem_hybrid(
        fine.dofh, fine.hanging, rhs_op, hy.cell_slot_table(fine.fmt),
        fine.fmt, gop, prm.simulation_type,
    )
    b = tf.tf_split_f64_host(np.asarray(rhs64, np.float64))
    precond = PreconditionMG(res.mg, jnp.float32)
    xb = np.asarray(res.x, np.float64)
    for k0 in (1, max(res.n_iterations, 1), res.n_iterations + 2):
        res_ch = api.mg_solve(
            fine.op, b, precond, prm.mg_data, n_levels=res.n_levels,
            dot=True, n_dofs=fine.dofh.n_dofs, df32=True, chain=k0,
            warmup=False,
        )
        assert res_ch.converged, k0
        assert res_ch.n_iterations == res.n_iterations, k0
        xa = np.asarray(fine.to_global(res_ch.x), np.float64)
        assert np.linalg.norm(xa - xb) / np.linalg.norm(xb) < 1e-6, k0


def test_sharded_df32_matches_single_device():
    """NumberType=df32 under an 8-device mesh: the double-single pair is
    sharded leaf-wise and the ownership-masked compensated dots must keep
    iteration and solution parity with the single-device df32 solve."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators

    def solve(n_shards):
        prm = _params("HMG-global", 3, number="df32", reltol=1e-6)
        prm.n_shards = n_shards
        mesh = generators.create("quadrant", 3, prm.n_ref_global, 0)
        return api.solve_with_global_coarsening_hybrid(prm, mesh)

    res1, _, _ = solve(1)
    res8, _, _ = solve(8)
    assert res8.converged
    assert abs(res8.n_iterations - res1.n_iterations) <= 1
    x1 = np.asarray(res1.x, np.float64)
    x8 = np.asarray(res8.x, np.float64)
    assert np.linalg.norm(x8 - x1) / np.linalg.norm(x1) < 1e-6


def test_cg_df32_jits_without_x64():
    """The df32 path must be jittable with x64 DISABLED (its whole point:
    no f64 on device)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        rng = np.random.default_rng(29)
        n = 128
        m = rng.standard_normal((n, n))
        a32 = jnp.asarray(m @ m.T + n * np.eye(n), jnp.float32)
        b = tf.tf_from_f32(jnp.asarray(rng.standard_normal(n), jnp.float32))

        @jax.jit
        def run(a, b):
            return tf.cg_solve_df32(lambda v: a @ v, b, reltol=1e-8, maxiter=500)

        res = run(a32, b)
        assert bool(res.converged)
        assert res.x.hi.dtype == jnp.float32
    finally:
        jax.config.update("jax_enable_x64", prev)

