"""Pallas kernels vs their pure-JAX oracles (interpret mode on CPU;
compiled path exercised on real TPU by tools/perf_kernels.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.ops import (
    distances as D,
    mfm as M,
    mining as MI,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas import (
    efm3_pallas,
    semi_hard_mining_pallas,
)


def test_efm3_pallas_matches_oracle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 513)).astype(np.float32))
    got = efm3_pallas(x, block_rows=32, interpret=True)
    ref = M.efm3(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_efm3_pallas_rejects_bad_channels():
    with pytest.raises(ValueError):
        efm3_pallas(jnp.zeros((8, 10)), interpret=True)


def _mining_case(seed, b=64, n=128, d=32, ids=10):
    rng = np.random.default_rng(seed)
    anc = rng.normal(size=(b, d)).astype(np.float32)
    pool = rng.normal(size=(n, d)).astype(np.float32)
    anc = anc / np.linalg.norm(anc, axis=1, keepdims=True)
    pool = pool / np.linalg.norm(pool, axis=1, keepdims=True)
    anc_lab = rng.integers(0, ids, b)
    pool_lab = rng.integers(0, ids, n)
    pos_sq = rng.uniform(0.5, 2.5, b).astype(np.float32)
    return (jnp.asarray(anc), jnp.asarray(pos_sq), jnp.asarray(anc_lab),
            jnp.asarray(pool), jnp.asarray(pool_lab))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_semi_hard_mining_pallas_matches_oracle(seed):
    anc, pos_sq, anc_lab, pool, pool_lab = _mining_case(seed)
    got = semi_hard_mining_pallas(anc, pos_sq, anc_lab, pool, pool_lab,
                                  tile_b=32, tile_n=32, interpret=True)
    sq = D.pairwise_sq_l2(anc, pool)
    ref = MI.mine_semi_hard_negative(sq, pos_sq, anc_lab, pool_lab)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_semi_hard_mining_pallas_single_tile():
    anc, pos_sq, anc_lab, pool, pool_lab = _mining_case(3, b=16, n=16)
    got = semi_hard_mining_pallas(anc, pos_sq, anc_lab, pool, pool_lab,
                                  tile_b=16, tile_n=16, interpret=True)
    sq = D.pairwise_sq_l2(anc, pool)
    ref = MI.mine_semi_hard_negative(sq, pos_sq, anc_lab, pool_lab)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_semi_hard_mining_fallback_to_farthest():
    """Anchors whose positives are farther than every negative take the
    farthest-negative fallback, matching the oracle."""
    anc, _, anc_lab, pool, pool_lab = _mining_case(4, b=32, n=64)
    pos_sq = jnp.full((32,), 100.0, jnp.float32)  # no semi-hard exists
    got = semi_hard_mining_pallas(anc, pos_sq, anc_lab, pool, pool_lab,
                                  tile_b=32, tile_n=32, interpret=True)
    sq = D.pairwise_sq_l2(anc, pool)
    ref = MI.mine_semi_hard_negative(sq, pos_sq, anc_lab, pool_lab)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_semi_hard_mining_rejects_nondividing_tiles():
    anc, pos_sq, anc_lab, pool, pool_lab = _mining_case(5, b=30, n=50)
    with pytest.raises(ValueError):
        semi_hard_mining_pallas(anc, pos_sq, anc_lab, pool, pool_lab,
                                tile_b=16, tile_n=16, interpret=True)


def test_head_train_step_with_fused_mining():
    """semi_hard_fused plugs into the standard head train step."""
    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.models.heads import (
        LinearHead,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        create_train_state,
        make_head_train_step,
        sgd_wd,
    )

    rng = np.random.default_rng(0)
    b, d = 32, 16
    anc = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 8, b))
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    fused = jax.jit(make_head_train_step(model, tx,
                                         mining_mode="semi_hard_fused"))
    plain = jax.jit(make_head_train_step(model, tx,
                                         mining_mode="semi_hard"))
    s1, m1 = fused(state, anc, pos, labels)
    s2, m2 = plain(state, anc, pos, labels)
    # identical mining choices -> identical loss and update
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)


# ---------------------------------------------------------------------------
# Fused front-half chain (conv1+mfm+pool -> conv2a+mfm -> conv2+mfm -> pool)
# ---------------------------------------------------------------------------


def _front9_params(seed=0, c1=96, c2a=96, c2=192):
    rng = np.random.default_rng(seed)

    def t(shape, s):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)

    return {
        "conv1": {"kernel": t((5, 5, 1, c1), 0.1), "bias": t((c1,), 0.1)},
        "conv2a": {"kernel": t((1, 1, c1 // 2, c2a), 0.1),
                   "bias": t((c2a,), 0.1)},
        "conv2": {"kernel": t((3, 3, c2a // 2, c2), 0.05),
                  "bias": t((c2,), 0.1)},
    }


@pytest.mark.parametrize("pool,wtap,maxout", [
    ("rows", "roll", "slices"),
    ("none", "roll", "slices"),
    ("rows", "slice3d", "slices"),
    ("rows", "roll", "roll"),
])
def test_front9_chain_matches_reference(pool, wtap, maxout):
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas import (
        front9_chain_pallas,
        front9_reference,
        pack_front9_weights,
    )

    params = _front9_params()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    packed = pack_front9_weights(params, dtype=jnp.float32)
    got = front9_chain_pallas(x, packed, pool=pool, interpret=True,
                              wtap=wtap, maxout=maxout)
    want = front9_reference(x, params, pool_out=pool != "none")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_front9_chain_bench_geometry_128px():
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas import (
        front9_chain_pallas,
        front9_reference,
        pack_front9_weights,
    )

    params = _front9_params(seed=1)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 1)).astype(np.float32))
    packed = pack_front9_weights(params, dtype=jnp.float32)
    got = front9_chain_pallas(x, packed, pool="rows", interpret=True)
    want = front9_reference(x, params, pool_out=True)
    assert got.shape == (1, 32, 32, 96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
