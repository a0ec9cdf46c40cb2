"""DeepFace + BEGAN-CS model/loss/step tests (reference capabilities C28/C29
— paper reconstructions, SURVEY.md §7 step 10)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.losses.began import (
    convergence_measure,
    cs_constraint,
    k_update,
    recon_l1,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models.began_cs import (
    AutoencoderDiscriminator,
    Generator,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models.deepface import (
    DeepFace,
    LocallyConnected2D,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train.gan import (
    create_gan_state,
    make_began_cs_train_step,
)


def test_locally_connected_matches_manual():
    """LC layer == per-position independent dot products."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    lc = LocallyConnected2D(features=4, kernel=(3, 3))
    variables = lc.init(jax.random.PRNGKey(0), x)
    out = lc.apply(variables, x)
    assert out.shape == (2, 4, 4, 4)
    w = np.asarray(variables["params"]["kernel"])  # [4, 4, 27, 4]
    b = np.asarray(variables["params"]["bias"])
    xn = np.asarray(x)
    # manual at position (1, 2): patch in CHW-within-patch order
    # (conv_general_dilated_patches emits channel-major patches: C x KH x KW)
    patch = xn[:, 1:4, 2:5, :]  # [2, 3, 3, 3]
    patch_cm = np.transpose(patch, (0, 3, 1, 2)).reshape(2, -1)
    expected = patch_cm @ w[1, 2] + b[1, 2]
    np.testing.assert_allclose(np.asarray(out[:, 1, 2, :]), expected,
                               rtol=1e-4, atol=1e-5)


def test_deepface_shapes_at_canonical_size():
    model = DeepFace(num_classes=10, feature_dim=512)
    x = jnp.zeros((1, 152, 152, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, feat = model.apply(variables, x)
    assert logits.shape == (1, 10)
    assert feat.shape == (1, 512)


def test_deepface_trains_with_backbone_step():
    """DeepFace plugs into the same joint train step as LightCNN."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        adam_factor,
        create_train_state,
        make_backbone_train_step,
    )

    rng = np.random.default_rng(1)
    b = 4
    # smallest size the LC ladder supports is ~96px (L6 5x5 needs >= 5 left)
    anc = jnp.asarray(rng.normal(size=(b, 96, 96, 1)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(b, 96, 96, 1)).astype(np.float32))
    labels = jnp.asarray(np.arange(b) % 3)
    model = DeepFace(num_classes=3, feature_dim=128)
    tx = adam_factor(base_lr=1e-3, decay_every_steps=100)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = jax.jit(make_backbone_train_step(model, tx))
    new_state, metrics = step(state, anc, pos, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_began_loss_pieces():
    x = jnp.ones((2, 4, 4, 1))
    r = jnp.zeros((2, 4, 4, 1))
    assert float(recon_l1(x, r)) == 1.0
    assert float(cs_constraint(jnp.ones((2, 8)), jnp.ones((2, 8)))) == 0.0
    # k update moves toward balance and clips
    k = k_update(jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.1),
                 gamma=0.5, lambda_k=1e-1)
    np.testing.assert_allclose(float(k), 0.04, rtol=1e-5)
    assert float(k_update(jnp.asarray(1.0), jnp.asarray(10.0),
                          jnp.asarray(0.0), lambda_k=1.0)) == 1.0
    m = convergence_measure(jnp.asarray(1.0), jnp.asarray(0.2), gamma=0.5)
    np.testing.assert_allclose(float(m), 1.3, rtol=1e-6)


def test_began_generator_discriminator_shapes():
    g = Generator(size=32, channels=1, n=8, h_dim=16)
    z = jnp.zeros((2, 16))
    gvars = g.init(jax.random.PRNGKey(0), z)
    img = g.apply(gvars, z)
    assert img.shape == (2, 32, 32, 1)
    assert float(jnp.abs(img).max()) <= 1.0
    d = AutoencoderDiscriminator(size=32, channels=1, n=8, h_dim=16)
    dvars = d.init(jax.random.PRNGKey(1), img)
    recon, latent = d.apply(dvars, img)
    assert recon.shape == img.shape
    assert latent.shape == (2, 16)


def test_began_cs_step_runs_and_k_moves():
    rng = np.random.default_rng(2)
    b = 4
    anc = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 1)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray(np.arange(b) % 2)
    g = Generator(size=32, channels=1, n=8, h_dim=16)
    d = AutoencoderDiscriminator(size=32, channels=1, n=8, h_dim=16)
    gtx, dtx = optax.adam(1e-4), optax.adam(1e-4)
    state = create_gan_state(g, d, gtx, dtx, jax.random.PRNGKey(0), anc, 16)
    step = jax.jit(make_began_cs_train_step(g, d, gtx, dtx, h_dim=16))
    s1, m1 = step(state, anc, pos, labels)
    s2, m2 = step(s1, anc, pos, labels)
    for k in ("loss_d", "loss_g", "loss_cs", "loss_triplet", "convergence"):
        assert np.isfinite(float(m2[k])), k
    assert int(s2.step) == 2
    # early in training gamma*L_real < L_fake, so k_t stays clipped at 0 —
    # just check it is live and in range (dynamics tested via k_update above)
    assert 0.0 <= float(s2.k_t) <= 1.0
    # generator params actually updated
    l0 = jax.tree_util.tree_leaves(state.gen_params)[0]
    l2 = jax.tree_util.tree_leaves(s2.gen_params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l2))


def test_began_cli_end_to_end(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_began,
    )

    out = str(tmp_path / "began")
    state, convergence = train_began.main([
        "--synthetic", "--synthetic-size", "32", "--epochs", "2",
        "--batch-size", "8", "--h-dim", "16", "--filters", "8",
        "--sample-every", "1", "--out-dir", out,
    ])
    assert len(convergence) == 2
    import os

    assert os.path.exists(os.path.join(out, "samples_0001.jpg"))
    assert os.path.exists(os.path.join(out, "convergence.jpg"))
    assert os.path.exists(os.path.join(out, "export_gen", "manifest.json"))


def test_deepface_cli_end_to_end(tmp_path):
    """VERDICT round-1 item 2 done-criterion: `train_backbone --model
    deepface --synthetic` trains (RGB >=65px path), extracts features with
    the export, and eval_cos consumes them."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        eval_cos,
        extract_features,
        train_backbone,
    )

    out = str(tmp_path / "df")
    state, history = train_backbone.main(
        ["--synthetic", "--model", "deepface", "--synthetic-size", "72",
         "--epochs", "1", "--batch-size", "8", "--out-dir", out])
    assert np.isfinite(history[0].train["loss"])

    ex = str(tmp_path / "ex")
    results = extract_features.main(
        ["--synthetic", "--model", "deepface", "--num-classes", "16",
         "--export-dir", out + "/export", "--out-dir", ex,
         "--batch-size", "16"])
    feats, labels, _ = results["valid"]
    assert feats.shape[1] == 4096  # F7 embedding dim

    ec = str(tmp_path / "ec")
    eval_cos.main(["--features", ex + "/valid.npz", "--out-dir", ec,
                   "--batch-size", "16"])
    assert (tmp_path / "ec" / "cosine_similarity.csv").exists()


def test_began_dp_step_8dev():
    """BEGAN-CS GAN step under shard_map data parallelism (the
    mutli_gpu-era capability for the GAN trainer): one step over the
    8-device mesh, finite losses, k_t updated identically on all shards."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel import (
        make_mesh,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train.gan import (
        shard_map_gan_step,
    )

    rng = np.random.default_rng(4)
    b, size, h_dim = 16, 32, 16
    imgs = jnp.asarray(rng.uniform(-1, 1, (b, size, size, 1)),
                       jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, b), jnp.int32)
    gen = Generator(size=size, channels=1, n=16, h_dim=h_dim)
    disc = AutoencoderDiscriminator(size=size, channels=1, n=16,
                                    h_dim=h_dim)
    gtx, dtx = optax.adam(1e-4), optax.adam(1e-4)
    state = create_gan_state(gen, disc, gtx, dtx, jax.random.PRNGKey(0),
                             imgs, h_dim)
    step = shard_map_gan_step(
        make_began_cs_train_step(gen, disc, gtx, dtx, h_dim=h_dim,
                                 axis_name="data"),
        make_mesh(jax.devices()[:8]))
    new_state, metrics = step(state, imgs, imgs, labels)
    for k in ("loss_d", "loss_g", "convergence"):
        assert np.isfinite(float(metrics[k])), k
    assert int(new_state.step) == 1
    assert np.isfinite(float(new_state.k_t))
