"""Pallas kernel parity (interpret mode on CPU; real lowering covered by the
driver's TPU bench)."""
import numpy as np
import jax.numpy as jnp

from spsnet_tpu.ops.pallas.fps import farthest_point_sample_pallas
from tests.reference_impls import fps_ref


def test_pallas_fps_interpret_parity():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(3, 300, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz), 64,
                                                  interpret=True))
    want = fps_ref(xyz, 64)
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_nonaligned_n():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(2, 197, 3)).astype(np.float32)  # N % 128 != 0
    got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz), 32,
                                                  interpret=True))
    want = fps_ref(xyz, 32)
    np.testing.assert_array_equal(got, want)
    assert got.max() < 197  # padding lanes never selected


def test_pallas_d2_interpret_parity():
    """ball_d2_bf16 == exact diff-form d2 up to bf16 output rounding."""
    from spsnet_tpu.ops.pallas.d2 import ball_d2_bf16, supports

    rng = np.random.default_rng(2)
    B, M, N = 2, 256, 512
    ctr = rng.uniform(-35, 35, (B, M, 3)).astype(np.float32)
    xyz = rng.uniform(-35, 35, (B, N, 3)).astype(np.float32)
    assert supports(jnp.asarray(ctr), jnp.asarray(xyz))
    got = np.asarray(ball_d2_bf16(jnp.asarray(ctr), jnp.asarray(xyz),
                                  interpret=True), dtype=np.float64)
    exact = ((ctr[:, :, None, :].astype(np.float64)
              - xyz[:, None, :, :]) ** 2).sum(-1)
    # bf16 has 8 bits of precision: relative error <= 2^-8
    np.testing.assert_allclose(got, exact, rtol=2 ** -8, atol=1e-6)


def test_pallas_d2_fps_v2_variant_parity():
    """The experimental hierarchical-argmax FPS matches the production
    kernel bit-for-bit (kept as a documented negative result)."""
    from spsnet_tpu.ops.pallas.fps import (_fps_pallas_allbatch,
                                           _fps_pallas_allbatch_v2)

    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-30, 30, (2, 640, 3)).astype(np.float32))
    a = np.asarray(_fps_pallas_allbatch(xyz, 128, interpret=True))
    b = np.asarray(_fps_pallas_allbatch_v2(xyz, 128, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_d2_supports_gate():
    from spsnet_tpu.ops.pallas.d2 import supports
    ok = jnp.zeros((1, 256, 3)), jnp.zeros((1, 512, 3))
    bad = jnp.zeros((1, 250, 3)), jnp.zeros((1, 500, 3))
    assert supports(*ok)
    assert not supports(bad[0], ok[1])  # M=250 not 8-aligned
    assert not supports(ok[0], bad[1])


def test_pallas_fps_chunked_semantics_and_coverage():
    """Chunked FPS: each slice's output is bit-exact FPS of that slice
    (offset restored, slices disjoint), and the stratified sample covers
    the scene nearly as well as exact FPS (coverage radius = max over
    points of the distance to the nearest sample)."""
    from spsnet_tpu.ops.pallas.fps import farthest_point_sample_chunked

    rng = np.random.default_rng(2)
    B, N, M, S = 2, 512, 128, 4
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample_chunked(
        jnp.asarray(xyz), M, S, interpret=True))
    assert got.shape == (B, M)
    nc, mc = N // S, M // S
    for s in range(S):
        want = fps_ref(xyz[:, s * nc:(s + 1) * nc], mc) + s * nc
        np.testing.assert_array_equal(got[:, s * mc:(s + 1) * mc], want)
    for b in range(B):
        assert len(set(got[b].tolist())) == M   # disjoint slices: no dups

    def coverage(samples):
        d = np.linalg.norm(xyz[:, :, None] - samples[:, None], axis=-1)
        return d.min(axis=2).max(axis=1)        # (B,) coverage radius

    exact = fps_ref(xyz, M)
    cov_exact = coverage(np.take_along_axis(
        xyz, exact[..., None].astype(np.int64), axis=1))
    cov_chunk = coverage(np.take_along_axis(
        xyz, got[..., None].astype(np.int64), axis=1))
    assert (cov_chunk <= 1.6 * cov_exact).all(), (cov_chunk, cov_exact)


def test_pallas_fps_seeded_semantics():
    """Seeded FPS == numpy twin: seeds arange(k0), dist initialized to the
    min-d2-to-seeds, then exact greedy FPS completions."""
    from spsnet_tpu.ops.pallas.fps import farthest_point_sample_seeded

    rng = np.random.default_rng(5)
    B, N, M, K0 = 2, 500, 256, 128           # N % 128 != 0: padding path
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32) * 5
    got = np.asarray(farthest_point_sample_seeded(
        jnp.asarray(xyz), M, K0, interpret=True))

    for b in range(B):
        d = ((xyz[b][:, None] - xyz[b][None]) ** 2).sum(-1)
        dist = d[:, :K0].min(axis=1)
        picks = list(range(K0))
        for _ in range(M - K0):
            nxt = int(np.argmax(dist))        # argmax ties -> lowest index
            picks.append(nxt)
            dist = np.minimum(dist, d[:, nxt])
        np.testing.assert_array_equal(got[b], np.asarray(picks, np.int32))
    assert got.max() < N


def test_pallas_fps_seeded_explicit_seed_idx():
    """Seeded FPS with ARBITRARY seed indices == numpy twin: output head is
    the given seeds verbatim, dist initialized to min-d2-over-those-seeds,
    then exact greedy completions."""
    from spsnet_tpu.ops.pallas.fps import farthest_point_sample_seeded

    rng = np.random.default_rng(9)
    B, N, M, K0 = 2, 500, 256, 128           # N % 128 != 0: padding path
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32) * 5
    seed_idx = np.stack([rng.permutation(N)[:K0] for _ in range(B)]
                        ).astype(np.int32)
    got = np.asarray(farthest_point_sample_seeded(
        jnp.asarray(xyz), M, K0, jnp.asarray(seed_idx), interpret=True))

    for b in range(B):
        d = ((xyz[b][:, None] - xyz[b][None]) ** 2).sum(-1)
        dist = d[:, seed_idx[b]].min(axis=1)
        picks = list(seed_idx[b])
        for _ in range(M - K0):
            nxt = int(np.argmax(dist))        # argmax ties -> lowest index
            picks.append(nxt)
            dist = np.minimum(dist, d[:, nxt])
        np.testing.assert_array_equal(got[b], np.asarray(picks, np.int32))
    assert got.max() < N


def test_grid_seed_indices_stratified_and_distinct():
    """grid_seed_indices returns k0 DISTINCT indices, prefers one rep per
    occupied voxel, and spreads seeds across clusters a random head
    wouldn't cover."""
    from spsnet_tpu.ops.pallas.fps import grid_seed_indices

    rng = np.random.default_rng(4)
    B, N, K0 = 2, 2048, 128
    # two tight clusters + sparse background: head seeding would land
    # ~45% of seeds inside the clusters; grid seeding caps them at the
    # cluster's occupied-cell count
    xyz = np.empty((B, N, 3), dtype=np.float32)
    for b in range(B):
        pts = np.concatenate([
            rng.normal(0, 0.05, (450, 3)) + [5, 5, 0],
            rng.normal(0, 0.05, (450, 3)) + [-5, -5, 0],
            rng.uniform(-20, 20, (N - 900, 3)),
        ]).astype(np.float32)
        xyz[b] = pts[rng.permutation(N)]
    seeds = np.asarray(grid_seed_indices(jnp.asarray(xyz), K0))
    assert seeds.shape == (B, K0)
    for b in range(B):
        assert len(np.unique(seeds[b])) == K0          # all distinct
        sx = xyz[b, seeds[b]]
        in_cluster = ((np.linalg.norm(sx - [5, 5, 0], axis=1) < 1)
                      | (np.linalg.norm(sx - [-5, -5, 0], axis=1) < 1))
        # 44% of points are clustered; stratified seeds should put far
        # fewer there than a proportional draw
        assert in_cluster.mean() < 0.15, in_cluster.mean()
