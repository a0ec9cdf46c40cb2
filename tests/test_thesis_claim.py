"""The thesis's core claim, as an integration test: triplet-loss training of
an embedding head measurably separates positive/negative cosine-similarity
distributions on HELD-OUT identities (reference README.md:7-8; the pipeline
of pre-trained_efm_v3.py -> test_efm_v2.py -> draw_cos_dis_real.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
    PairBatcher,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.eval.cosine import (
    separation_score,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models.heads import (
    LinearHead,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.ops.distances import (
    l2_normalize,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    create_train_state,
    make_head_train_step,
    sgd_wd,
)


def _make(num_ids, per_id, seed, sig_dim=8, dim=64, noise=2.0):
    """Identity signal in a small subspace drowned by nuisance directions —
    raw cosine similarity barely separates; a learned projection can."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(num_ids, sig_dim)).astype(np.float32)
    labels = np.repeat(np.arange(num_ids), per_id)
    sig = centers[labels]
    nui = noise * rng.normal(size=(labels.size, dim - sig_dim)).astype(
        np.float32)
    feats = np.concatenate([sig, nui], 1)
    return feats / np.linalg.norm(feats, axis=1, keepdims=True), labels


def _separation(feats, labels, seed=3, pairs=2000):
    f = np.asarray(l2_normalize(jnp.asarray(feats)))
    rng = np.random.default_rng(seed)
    pos, neg = [], []
    for _ in range(pairs):
        i, j = rng.integers(0, len(labels), 2)
        s = float(f[i] @ f[j])
        (pos if labels[i] == labels[j] and i != j else neg).append(s)
    return separation_score(np.asarray(pos), np.asarray(neg))


def test_triplet_head_improves_heldout_separation():
    train_f, train_l = _make(40, 12, seed=0)
    test_f, test_l = _make(10, 12, seed=99)  # disjoint identities

    model = LinearHead(out_dim=16)
    tx = sgd_wd(lr=0.1, weight_decay=1e-5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), train_f[:1])
    step = jax.jit(make_head_train_step(
        model, tx, margin=0.2, mining_mode="semi_hard",
        normalize_embeddings=True))
    batcher = PairBatcher(train_f, train_l, 120, shuffle=True, seed=1)
    for _ in range(60):
        for anc, pos, lab in batcher:
            state, metrics = step(state, anc, pos, lab)

    emb_test = np.asarray(model.apply({"params": state.params},
                                      jnp.asarray(test_f)))
    before = _separation(test_f, test_l)
    after = _separation(emb_test, test_l)
    # measured: 0.600 -> 0.905 with these seeds; require a solid margin
    assert before < 0.7
    assert after > 0.85
    assert after - before > 0.15
    assert float(metrics["loss"]) < 0.1
