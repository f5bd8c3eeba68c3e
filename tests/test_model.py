"""Recurrent autoencoder: shapes, recurrence, gradients, export."""
import numpy as np
import jax
import jax.numpy as jnp

from ai_path_tracer_denoiser_tpu.config import ModelOptions
from ai_path_tracer_denoiser_tpu.models import (
    init_autoencoder, init_hidden, apply_frame, apply_sequence, param_count,
    save_model, load_model)

OPTS = ModelOptions()


def _setup(h=64, w=64, n=1):
    key = jax.random.PRNGKey(0)
    params, state = init_autoencoder(key, OPTS)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, 10))
    hidden = init_hidden(n, h, w, OPTS)
    return params, state, x, hidden


def test_forward_shapes():
    params, state, x, hidden = _setup()
    y, new_hidden, new_state = apply_frame(params, state, x, hidden, train=True)
    assert y.shape == (1, 64, 64, 3)
    assert new_hidden["enc1"].shape == (1, 64, 64, 32)
    assert new_hidden["enc5"].shape == (1, 4, 4, 101)
    assert new_hidden["bottleneck"].shape == (1, 2, 2, 101)
    assert np.isfinite(np.asarray(y)).all()


def test_param_count_close_to_reference():
    """Reference channel plan ~= 1.9M params; sanity-check the same order."""
    params, _ = init_autoencoder(jax.random.PRNGKey(0), OPTS)
    n = param_count(params)
    assert 1_000_000 < n < 4_000_000


def test_recurrence_uses_hidden():
    params, state, x, hidden = _setup(h=32, w=32)
    y1, h1, _ = apply_frame(params, state, x, hidden)
    # same input, but hidden from the previous step -> different output
    y2, _, _ = apply_frame(params, state, x, h1)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_sequence_scan_matches_frame_loop():
    params, state, x, hidden = _setup(h=32, w=32)
    seq = jnp.stack([x, x * 0.5, x * 0.25], axis=0)  # (3, N, H, W, C)
    ys, _, _ = apply_sequence(params, state, seq, train=False)
    # manual loop
    h = hidden
    st = state
    outs = []
    for j in range(3):
        y, h, st = apply_frame(params, st, seq[j], h, train=False)
        outs.append(y)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(jnp.stack(outs)),
                               rtol=2e-5, atol=2e-5)


def test_batchnorm_train_vs_eval():
    params, state, x, hidden = _setup(h=32, w=32)
    y_train, _, new_state = apply_frame(params, state, x, hidden, train=True)
    # running stats moved
    moved = np.abs(np.asarray(new_state["enc1"]["bn1"]["mean"])).max()
    assert moved > 0
    y_eval, _, same_state = apply_frame(params, state, x, hidden, train=False)
    leaves1 = jax.tree_util.tree_leaves(state)
    leaves2 = jax.tree_util.tree_leaves(same_state)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradients_flow_through_sequence():
    params, state, x, hidden = _setup(h=32, w=32)
    seq = jnp.stack([x, x], axis=0)
    target = jnp.zeros((2, 1, 32, 32, 3))

    def loss(p):
        ys, _, _ = apply_sequence(p, state, seq, train=True)
        return jnp.mean(jnp.abs(ys - target))

    grads = jax.grad(loss)(params)
    gnorms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(gnorms))
    # BPTT through frame 0 must reach encoder conv1 (recurrence chain)
    assert float(jnp.abs(grads["enc1"]["conv1"]["w"]).max()) > 0


def test_bf16_compute_close_to_f32():
    params, state, x, hidden = _setup(h=32, w=32)
    y32, _, _ = apply_frame(params, state, x, hidden, train=False, bf16=False)
    y16, _, _ = apply_frame(params, state, x, hidden, train=False, bf16=True)
    # bf16 convs with f32 accumulation stay close
    diff = np.abs(np.asarray(y32) - np.asarray(y16)).mean()
    assert diff < 0.1


def test_tpu_friendly_channel_plan():
    opts = ModelOptions.tpu_friendly()
    params, state = init_autoencoder(jax.random.PRNGKey(0), opts)
    x = jnp.zeros((1, 32, 32, 10))
    hidden = init_hidden(1, 32, 32, opts)
    y, _, _ = apply_frame(params, state, x, hidden)
    assert y.shape == (1, 32, 32, 3)


def test_export_roundtrip(tmp_path):
    params, state, x, hidden = _setup(h=32, w=32)
    y1, _, _ = apply_frame(params, state, x, hidden)
    path = str(tmp_path / "model.npz")
    save_model(path, params, state, {"widths": list(OPTS.widths)})
    p2, s2, meta = load_model(path)
    assert meta["widths"] == list(OPTS.widths)
    y2, _, _ = apply_frame(p2, s2, x, hidden)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_model_options_from_params_derives_widths():
    """Export/eval derive the channel plan from checkpoint shapes — a
    tpu_friendly checkpoint exported or evaluated without any flag gets the
    right widths metadata (r2 review finding)."""
    import jax

    from ai_path_tracer_denoiser_tpu.models import (init_autoencoder,
                                                    model_options_from_params)
    for opts in (ModelOptions(), ModelOptions.tpu_friendly()):
        params, _ = init_autoencoder(jax.random.PRNGKey(0), opts)
        assert model_options_from_params(params).widths == opts.widths
