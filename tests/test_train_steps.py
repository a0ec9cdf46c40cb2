"""Train-step tests: loss decreases, determinism, and shard_map data
parallelism on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    EFMNet342,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models.heads import (
    LinearHead,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.parallel import (
    make_mesh,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    HEAD_METRIC_KEYS,
    create_train_state,
    adam_factor,
    factor_schedule,
    make_backbone_eval_step,
    make_backbone_train_step,
    make_head_eval_step,
    make_head_train_step,
    sgd_wd,
    shard_map_step,
)


def _head_batch(rng, b=32, d=16, ids=8):
    """(anchor, positive, labels) feature batch."""
    labels_half = rng.integers(0, ids, size=(b,))
    centers = rng.normal(size=(ids, d)).astype(np.float32)
    anc = centers[labels_half] + 0.1 * rng.normal(size=(b, d)).astype(np.float32)
    pos = centers[labels_half] + 0.1 * rng.normal(size=(b, d)).astype(np.float32)
    return jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(labels_half)


def _image_batch(rng, b=4, size=32, ids=3):
    anc = jnp.asarray(rng.normal(size=(b, size, size, 1)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(b, size, size, 1)).astype(np.float32))
    labels = jnp.asarray(np.arange(b) % ids)
    return anc, pos, labels


def test_head_train_step_decreases_loss():
    rng = np.random.default_rng(0)
    anc, pos, labels = _head_batch(rng)
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    # large margin guarantees a non-zero hinge at init so descent is visible
    step = jax.jit(make_head_train_step(model, tx, margin=20.0))
    losses = []
    for _ in range(30):
        state, metrics = step(state, anc, pos, labels)
        losses.append(float(metrics["loss"]))
    assert losses[0] > 0.0
    assert losses[-1] < losses[0]
    assert metrics["pos_cos"].shape == (32,)
    assert metrics["neg_cos"].shape == (32,)


def test_head_step_deterministic_replay():
    rng = np.random.default_rng(1)
    anc, pos, labels = _head_batch(rng)
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    s0 = create_train_state(model, tx, jax.random.PRNGKey(7), anc)
    step = jax.jit(make_head_train_step(model, tx))
    _, m1 = step(s0, anc, pos, labels)
    _, m2 = step(s0, anc, pos, labels)
    np.testing.assert_array_equal(np.asarray(m1["neg_cos"]), np.asarray(m2["neg_cos"]))


@pytest.mark.parametrize("mining_mode", ["random", "semi_hard", "hard"])
def test_head_mining_modes_run(mining_mode):
    rng = np.random.default_rng(2)
    anc, pos, labels = _head_batch(rng)
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.01)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = jax.jit(make_head_train_step(model, tx, mining_mode=mining_mode))
    state, metrics = step(state, anc, pos, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_backbone_train_step_runs_and_updates():
    rng = np.random.default_rng(3)
    anc, pos, labels = _image_batch(rng)
    model = EFMNet342(num_classes=3)
    tx = adam_factor(base_lr=1e-3, decay_every_steps=100)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = jax.jit(make_backbone_train_step(model, tx, margin=0.2, alpha=0.1))
    new_state, metrics = step(state, anc, pos, labels)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["acc"]))
    # params actually moved
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_backbone_mine_anchor_half_only():
    rng = np.random.default_rng(8)
    anc, pos, labels = _image_batch(rng)
    model = EFMNet342(num_classes=3)
    tx = adam_factor(base_lr=1e-3, decay_every_steps=100)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = jax.jit(make_backbone_train_step(model, tx,
                                            mine_anchor_half_only=True))
    _, metrics = step(state, anc, pos, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_backbone_eval_step():
    rng = np.random.default_rng(4)
    anc, pos, labels = _image_batch(rng)
    model = EFMNet342(num_classes=3)
    tx = adam_factor()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    ev = jax.jit(make_backbone_eval_step(model))
    metrics = ev(state, anc, pos, labels)
    assert metrics["pos_cos"].shape == (4,)


def test_factor_schedule_matches_mxnet_semantics():
    sched = factor_schedule(0.00024, decay_every_steps=10, factor=0.88,
                            stop_lr=5e-15)
    np.testing.assert_allclose(float(sched(0)), 0.00024, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 0.00024, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 0.00024 * 0.88, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.00024 * 0.88**2, rtol=1e-6)
    assert float(sched(100000)) == pytest.approx(5e-15)


# ---------- data parallel (8-device virtual mesh) ----------


def test_head_step_shard_map_8dev():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(5)
    anc, pos, labels = _head_batch(rng, b=32)  # 4 anchors per shard
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = shard_map_step(
        make_head_train_step(model, tx, margin=20.0, axis_name="data"),
        mesh, has_state_out=True, metric_keys=HEAD_METRIC_KEYS)
    losses = []
    for _ in range(10):
        state, metrics = step(state, anc, pos, labels)
        losses.append(float(metrics["loss"]))
    assert losses[0] > 0.0
    assert losses[-1] < losses[0]
    assert metrics["pos_cos"].shape == (32,)


def test_head_eval_shard_map_8dev():
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(6)
    anc, pos, labels = _head_batch(rng, b=32)
    model = LinearHead(out_dim=8)
    tx = sgd_wd()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    ev = shard_map_step(
        make_head_eval_step(model, axis_name="data"),
        mesh, has_state_out=False, metric_keys=HEAD_METRIC_KEYS)
    metrics = ev(state, anc, pos, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_dp_update_matches_single_device_semi_hard():
    """With deterministic (semi-hard) mining over the *global* pool, the DP
    step must produce the same parameter update as a single device running
    the full global batch."""
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(7)
    anc, pos, labels = _head_batch(rng, b=32)
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(3), anc)

    single = jax.jit(make_head_train_step(model, tx, mining_mode="semi_hard"))
    dp = shard_map_step(
        make_head_train_step(model, tx, mining_mode="semi_hard",
                             axis_name="data"),
        mesh, has_state_out=True, metric_keys=HEAD_METRIC_KEYS)

    s1, m1 = single(state, anc, pos, labels)
    s2, m2 = dp(state, anc, pos, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)


def test_backbone_shard_map_8dev():
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(9)
    anc, pos, labels = _image_batch(rng, b=8, ids=4)
    model = EFMNet342(num_classes=4)
    tx = adam_factor(base_lr=1e-3, decay_every_steps=100)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = shard_map_step(
        make_backbone_train_step(model, tx, axis_name="data"),
        mesh, has_state_out=True)
    new_state, metrics = step(state, anc, pos, labels)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["pos_cos"].shape == (8,)


def test_multislice_2d_mesh_matches_single_device():
    """The same step functions run over a 2-D (dcn x data) mesh with tuple
    axis names — the multislice scaling path (SURVEY.md §5.8)."""
    from jax.sharding import PartitionSpec as P

    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel.mesh import (
        make_multislice_mesh,
    )

    mesh = make_multislice_mesh(ici_size=4)  # 2 x 4 over the virtual devices
    rng = np.random.default_rng(11)
    anc, pos, labels = _head_batch(rng, b=32)
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    axis = ("dcn", "data")
    step = jax.jit(jax.shard_map(
        make_head_train_step(model, tx, mining_mode="semi_hard",
                             axis_name=axis),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), {"loss": P(), "pos_cos": P(axis),
                         "neg_cos": P(axis)})))
    s2, m2 = step(state, anc, pos, labels)
    single = jax.jit(make_head_train_step(model, tx, mining_mode="semi_hard"))
    s1, m1 = single(state, anc, pos, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)


def test_backbone_center_loss_option():
    """center_weight > 0 adds the facenet center loss and updates the
    centers table threaded through state.aux."""
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    anc, pos, labels = _image_batch(rng)
    model = EFMNet342(num_classes=3)
    tx = adam_factor(base_lr=1e-3, decay_every_steps=100)
    centers0 = jnp.zeros((3, 342), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc,
                               aux=centers0)
    step = jax.jit(make_backbone_train_step(model, tx, center_weight=0.5))
    new_state, metrics = step(state, anc, pos, labels)
    assert np.isfinite(float(metrics["loss"]))
    # centers moved toward the embeddings of the seen classes
    assert not np.allclose(np.asarray(new_state.aux), 0.0)
    # plain step (weight 0) leaves aux untouched
    step0 = jax.jit(make_backbone_train_step(model, tx))
    s0, m0 = step0(state, anc, pos, labels)
    np.testing.assert_array_equal(np.asarray(s0.aux), np.asarray(centers0))
    # center loss increases the total loss vs the plain step
    assert float(metrics["loss"]) >= float(m0["loss"])


def test_backbone_device_mirror_augment_runs():
    rng = np.random.default_rng(13)
    anc, pos, labels = _image_batch(rng)
    model = EFMNet342(num_classes=3)
    tx = adam_factor(base_lr=1e-3, decay_every_steps=100)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = jax.jit(make_backbone_train_step(model, tx, mirror_augment=True))
    s1, m1 = step(state, anc, pos, labels)
    assert np.isfinite(float(m1["loss"]))
    # augmentation is deterministic per (base_key, step): replay matches
    s2, m2 = step(state, anc, pos, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]))


def test_distributed_noop_on_single_host():
    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel.distributed import (
        initialize_distributed,
        process_info,
    )

    assert initialize_distributed() is False  # no coordinator env set
    idx, count = process_info()
    assert idx == 0 and count == 1


def test_param_ema_tracks_and_checkpoints():
    """with_param_ema: the EMA converges toward the trained params, rides
    in opt_state (free checkpointing), and get_ema_params reads it back
    (facenet ExponentialMovingAverage parity)."""
    import optax

    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        get_ema_params,
        with_param_ema,
    )

    params = {"w": jnp.zeros((3,))}
    tx = with_param_ema(optax.sgd(1.0), decay=0.5)
    opt_state = tx.init(params)
    grads = {"w": -jnp.ones((3,))}  # sgd(1.0): params += 1 each step
    expected_ema = np.zeros(3)
    p = params
    for step in range(5):
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        expected_ema = 0.5 * expected_ema + 0.5 * np.asarray(p["w"])
    np.testing.assert_allclose(np.asarray(get_ema_params(opt_state)["w"]),
                               expected_ema, rtol=1e-6)
    # EMA lags the raw params (params are at 5.0 after 5 unit steps)
    np.testing.assert_allclose(np.asarray(p["w"]), 5.0)
    assert float(get_ema_params(opt_state)["w"][0]) < 5.0


def test_train_backbone_cli_ema_export(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_backbone,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        load_exported_params,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        get_ema_params,
    )

    out = str(tmp_path / "ema")
    state, _ = train_backbone.main([
        "--synthetic", "--synthetic-size", "16", "--model", "lightcnn9",
        "--ema-decay", "0.9", "--epochs", "1", "--batch-size", "16",
        "--out-dir", out])
    exported, _, _ = load_exported_params(out + "/export")
    ema = get_ema_params(state.opt_state)
    np.testing.assert_allclose(
        exported["conv1"]["kernel"], np.asarray(ema["conv1"]["kernel"]),
        rtol=1e-6)
    # and the export differs from the raw (non-averaged) weights
    assert not np.allclose(exported["conv1"]["kernel"],
                           np.asarray(state.params["conv1"]["kernel"]))


def test_resume_with_ema_opt_state(tmp_path):
    """orbax checkpoint/resume carries the ParamEmaState NamedTuple inside
    opt_state (EMA training is resumable)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_backbone,
    )

    out = str(tmp_path / "r")
    args = ["--synthetic", "--synthetic-size", "16", "--model", "lightcnn9",
            "--ema-decay", "0.9", "--batch-size", "16", "--out-dir", out]
    train_backbone.main(args + ["--epochs", "1"])
    state2, history2 = train_backbone.main(
        args + ["--epochs", "2", "--resume"])
    # resumed: only epoch 1 ran in the second invocation
    assert [h.epoch for h in history2] == [1]
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        get_ema_params,
    )

    ema = get_ema_params(state2.opt_state)
    assert np.isfinite(np.asarray(ema["conv1"]["kernel"]).sum())


@pytest.mark.parametrize("name", ["adagrad", "adadelta", "rmsprop", "mom",
                                  "sgd"])
def test_backbone_optimizer_family(name):
    """facenet.py:168-184 optimizer choices on the reference factor
    schedule: every member optimizes a quadratic toward its minimum, and
    `adam` is exactly adam_factor."""
    import optax

    from improving_face_recognition_performance_using_triplet_loss_tpu.train.optim import (
        adam_factor,
        backbone_optimizer,
    )

    tx = backbone_optimizer(name, base_lr=0.1, decay_every_steps=1000)
    params = {"w": jnp.asarray([4.0, -3.0])}
    state = tx.init(params)
    for _ in range(60):
        grads = {"w": 2 * params["w"]}  # d/dw ||w||^2
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    # every member descends ||w||^2 (adagrad/adadelta shrink their
    # effective step by design, so assert monotone progress, not a target)
    final = float(jnp.abs(params["w"]).max())
    assert np.isfinite(final) and final < 4.0

    # adam == adam_factor step for step
    tx_a = backbone_optimizer("adam", base_lr=0.01, decay_every_steps=7,
                              factor=0.5)
    tx_b = adam_factor(base_lr=0.01, decay_every_steps=7, factor=0.5)
    pa = pb = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    sa, sb = tx_a.init(pa), tx_b.init(pb)
    for i in range(10):
        g = {"w": jnp.asarray([0.1 * i, -0.2, 0.3])}
        ua, sa = tx_a.update(g, sa, pa)
        ub, sb = tx_b.update(g, sb, pb)
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
    np.testing.assert_allclose(np.asarray(pa["w"]), np.asarray(pb["w"]),
                               rtol=1e-6)

    with pytest.raises(ValueError):
        backbone_optimizer("adamw2")


def test_filter_grad_im2col_equals_vjp():
    """The im2col dW reformulation (backward-MFU campaign, ops/
    conv_backward.py) is numerically the standard vjp filter gradient —
    across the ladder's kernel shapes incl. the k=5 Cin=1 stem and 1x1s."""
    import jax
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.conv_backward import (
        conv2d_fg_im2col,
        filter_grad_im2col,
        input_grad,
    )

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    for (h, cin, cout, k) in [(12, 1, 8, 5), (10, 6, 16, 3), (8, 4, 8, 1)]:
        x = jnp.asarray(rng.normal(size=(3, h, h, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.float32)
        dy = jnp.asarray(rng.normal(size=(3, h, h, cout)), jnp.float32)
        _, vjp = jax.vjp(conv, x, w)
        dx_ref, dw_ref = vjp(dy)
        dw = filter_grad_im2col(x, dy, k, "SAME")
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                                   rtol=1e-4, atol=1e-4)
        dx = input_grad(dy, w)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-4)
        # the custom_vjp conv: same forward, same full gradient
        def loss_a(x_, w_):
            return (conv(x_, w_) ** 2).sum()

        def loss_b(x_, w_):
            return (conv2d_fg_im2col(x_, w_) ** 2).sum()

        ga = jax.grad(loss_a, argnums=(0, 1))(x, w)
        gb = jax.grad(loss_b, argnums=(0, 1))(x, w)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-3)


def test_im2col_bwd_interceptor_preserves_training_math():
    """Routing a whole model's convs through conv2d_fg_im2col (the
    intercept_methods flip) changes the backward FORMULATION only: one
    LightCNN9 train step yields the same loss and the same gradients as
    the stock path (f32 tolerances)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.conv_backward import (
        conv_interceptor_im2col_bwd,
    )

    model = LightCNN9(num_classes=5, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 1)),
                    jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params, intercept):
        def fwd():
            logits, feat = model.apply(
                {**variables, "params": params}, x, train=False)
            return logits, feat
        if intercept:
            with nn.intercept_methods(conv_interceptor_im2col_bwd()):
                logits, feat = fwd()
        else:
            logits, feat = fwd()
        one_hot = jax.nn.one_hot(labels, 5)
        return (-(one_hot * jax.nn.log_softmax(logits)).sum()
                + 1e-3 * (feat ** 2).sum())

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(
        variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(
        variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_backbone_step_bwd_im2col_matches_stock():
    """The bwd_im2col train-step flag changes the filter-grad FORMULATION
    only: one EFMNet342 step from the same state yields the same loss and
    the same updated params as the stock step (f32)."""
    import jax
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        adam_factor,
        create_train_state,
        make_backbone_train_step,
    )

    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        sgd_wd,
    )

    model = EFMNet342(num_classes=6, dtype=jnp.float32)
    # SGD, not Adam: the updated params are LINEAR in the gradient, so a
    # formulation-level comparison has sane tolerances (Adam's first-step
    # sign normalization would turn ~1e-7 reassociation noise on
    # near-zero grads into full +-lr flips)
    tx = sgd_wd(lr=1e-2)
    rng = np.random.default_rng(0)
    anc = jnp.asarray(rng.uniform(size=(4, 32, 32, 1)), jnp.float32)
    pos = jnp.asarray(rng.uniform(size=(4, 32, 32, 1)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)

    s0, m0 = make_backbone_train_step(model, tx, mining_mode="semi_hard")(
        state, anc, pos, labels)
    s1, m1 = make_backbone_train_step(model, tx, mining_mode="semi_hard",
                                      bwd_im2col=True)(
        state, anc, pos, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_backbone_step_remat_policy_is_exact():
    """remat_policy ("dots"/"full") changes WHEN residuals are
    (re)computed, never WHAT is computed: same state, same batch, same
    dropout key => bitwise-identical loss and updated params vs the
    stock step. (The round-4 bandwidth counter-experiment: the trace
    decomposition measured 57% of the B=256 step in elementwise passes
    at the HBM peak, so remat trades those stored bytes for recompute.)
    """
    import jax
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        adam_factor,
        create_train_state,
        make_backbone_train_step,
    )

    model = EFMNet342(num_classes=6, dtype=jnp.float32)
    tx = adam_factor(base_lr=1e-3, decay_every_steps=100)
    rng = np.random.default_rng(1)
    anc = jnp.asarray(rng.uniform(size=(4, 32, 32, 1)), jnp.float32)
    pos = jnp.asarray(rng.uniform(size=(4, 32, 32, 1)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)

    s0, m0 = make_backbone_train_step(model, tx, mining_mode="semi_hard")(
        state, anc, pos, labels)
    for policy in ("dots", "full"):
        s1, m1 = make_backbone_train_step(
            model, tx, mining_mode="semi_hard", remat_policy=policy)(
            state, anc, pos, labels)
        assert float(m1["loss"]) == float(m0["loss"]), policy
        for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
