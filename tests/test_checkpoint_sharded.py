"""Sharded checkpoint/resume: a class-parallel TrainState (fc2 + its
optimizer mirrors sharded over the 'model' mesh axis) round-trips through
orbax and resumes BITWISE — the thing a real v5e-8 preemption needs
(SURVEY.md §5.4; VERDICT r4 item 5). The reference has no resume at all
(train_efm.py:289-290 saves params only); here the full sharded state
(params + optimizer + step) must come back with its shardings intact."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from improving_face_recognition_performance_using_triplet_loss_tpu.parallel import (
    make_2d_mesh,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    Checkpointer,
    create_train_state,
    infer_class_parallel_specs,
    make_backbone_train_step,
    shard_map_step_2d,
)

C = 12  # global classes; shards of 3 over model=4


class _TinyNet(nn.Module):
    """Dropout/BN-free (logits, feat) net, head named fc2 like the real
    models — deterministic, so resumed losses compare bitwise."""

    num_classes: int
    feature_dim: int = 8

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        feat = nn.tanh(nn.Dense(self.feature_dim, name="fc1")(x))
        logits = nn.Dense(self.num_classes, name="fc2")(feat)
        return logits, feat


def _shard_state(state, specs, mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def test_sharded_checkpoint_resume_bitwise(tmp_path):
    model_size = 4
    mesh = make_2d_mesh(model_size=model_size)
    rng = np.random.default_rng(0)
    b = 8
    anc = jnp.asarray(rng.random((b, 6, 6, 1)), jnp.float32)
    pos = jnp.asarray(rng.random((b, 6, 6, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, b), jnp.int32)

    tx = optax.adam(1e-3)  # adam: optimizer mirrors (mu/nu) are sharded too
    state = create_train_state(_TinyNet(num_classes=C), tx,
                               jax.random.PRNGKey(0), np.asarray(anc[:1]))
    specs = infer_class_parallel_specs(state, C, "model")
    state = _shard_state(state, specs, mesh)
    assert state.params["fc2"]["kernel"].sharding.spec == P(None, "model")

    step = shard_map_step_2d(
        make_backbone_train_step(_TinyNet(num_classes=C // model_size), tx,
                                 mining_mode="hard", axis_name="data",
                                 class_axis_name="model"),
        mesh, specs, has_state_out=True)
    for _ in range(2):
        state, _ = step(state, anc, pos, labels)
    # the trained state's fc2 (and its adam mirrors) are STILL sharded
    assert state.params["fc2"]["kernel"].sharding.spec == P(None, "model")

    with Checkpointer(str(tmp_path / "ckpt")) as ck:
        ck.save(2, state, wait=True)

        # uninterrupted continuation (the oracle)
        cont_state, cont_m = step(state, anc, pos, labels)

        # 'crash': restore into a SHARDED template (zeros placed with the
        # same NamedShardings) — orbax must bring the state back sharded
        template = _shard_state(
            jax.tree_util.tree_map(jnp.zeros_like, state), specs, mesh)
        restored = ck.restore(template)

    assert int(restored.step) == 2
    assert restored.params["fc2"]["kernel"].sharding.spec == P(None, "model")
    for a, b_ in zip(jax.tree_util.tree_leaves(state),
                     jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # resumed next step == uninterrupted next step, BITWISE
    res_state, res_m = step(restored, anc, pos, labels)
    np.testing.assert_array_equal(np.asarray(res_m["loss"]),
                                  np.asarray(cont_m["loss"]))
    for a, b_ in zip(jax.tree_util.tree_leaves(cont_state.params),
                     jax.tree_util.tree_leaves(res_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
