"""Training-stack tests: STFT parity vs torch, MAS, losses, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mimic3_tpu.config import ModelConfig, TrainingConfig
from mimic3_tpu.models.vits.mas import monotonic_alignment_search
from mimic3_tpu.models.vits.train import (
    TrainBatch,
    init_train_state,
    make_train_step,
    random_segments,
)
from mimic3_tpu.ops.stft import mel_filterbank, mel_spectrogram, spectrogram


def test_spectrogram_matches_torch_stft():
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 4096).astype(np.float32) * 0.2
    n_fft, hop, win = 1024, 256, 1024

    spec_j = np.asarray(spectrogram(jnp.array(audio), n_fft, hop, win))

    pad = (n_fft - hop) // 2
    audio_t = torch.nn.functional.pad(
        torch.tensor(audio).unsqueeze(1), (pad, pad), mode="reflect"
    ).squeeze(1)
    spec_t = torch.stft(
        audio_t,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        return_complex=True,
    ).abs()  # [B, bins, frames]
    spec_t = spec_t.numpy().transpose(0, 2, 1)

    assert spec_j.shape == spec_t.shape
    np.testing.assert_allclose(spec_j, spec_t, atol=2e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # triangles: each mel channel peaks at increasing frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # every channel has some support
    assert (fb.sum(axis=0) > 0).all()


def test_mel_spectrogram_shape():
    audio = jnp.zeros((1, 2560))
    mel = mel_spectrogram(audio)
    assert mel.shape == (1, 10, 80)
    # silence compresses to the epsilon floor (spec eps 1e-6 inside sqrt,
    # the same convention VITS's spectrogram uses)
    assert float(np.asarray(mel).max()) < -9.0


def _brute_mas(ll, tt, ts):
    neg = -1e9
    val = np.full((tt, ts), neg)
    back = np.zeros((tt, ts), bool)
    val[0, 0] = ll[0, 0]
    for t in range(1, ts):
        for j in range(tt):
            stay = val[j, t - 1]
            diag = val[j - 1, t - 1] if j > 0 else neg
            if diag >= stay:
                val[j, t] = diag + ll[j, t]
                back[j, t] = True
            else:
                val[j, t] = stay + ll[j, t]
    path = np.zeros((tt, ts))
    j = tt - 1
    for t in range(ts - 1, -1, -1):
        path[j, t] = 1
        if t > 0 and back[j, t]:
            j -= 1
    return path


def test_mas_matches_bruteforce():
    rng = np.random.RandomState(3)
    ll = rng.randn(4, 9, 21).astype(np.float32)
    tts = np.array([9, 5, 2, 7])
    tss = np.array([21, 13, 9, 7])
    path = np.asarray(
        monotonic_alignment_search(
            jnp.array(ll), jnp.array(tts), jnp.array(tss)
        )
    )
    for b in range(4):
        ref = _brute_mas(ll[b, : tts[b], : tss[b]], tts[b], tss[b])
        np.testing.assert_array_equal(path[b, : tts[b], : tss[b]], ref)
        # nothing outside the valid region
        assert path[b, tts[b]:, :].sum() == 0
        assert path[b, :, tss[b]:].sum() == 0
        # exactly one text position per valid frame
        np.testing.assert_array_equal(
            path[b, :, : tss[b]].sum(axis=0), 1.0
        )


def test_random_segments_in_bounds():
    values = jnp.arange(2 * 20).reshape(2, 20, 1).astype(jnp.float32)
    lengths = jnp.array([20, 12])
    seg, starts = random_segments(
        values, lengths, jax.random.PRNGKey(0), 8
    )
    assert seg.shape == (2, 8, 1)
    s = np.asarray(starts)
    assert (s >= 0).all()
    assert s[0] <= 12 and s[1] <= 4
    # segments are contiguous slices
    np.testing.assert_allclose(
        np.asarray(seg[0, :, 0]), np.arange(s[0], s[0] + 8)
    )


def test_train_step_runs_and_losses_finite():
    cfg = TrainingConfig()
    cfg.model = ModelConfig(
        num_symbols=40,
        n_layers=1,
        hidden_channels=32,
        inter_channels=32,
        filter_channels=64,
        upsample_initial_channel=64,
    )
    cfg.segment_size = 2048
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    batch = TrainBatch(
        phoneme_ids=jnp.asarray(rng.randint(1, 40, (2, 6)), jnp.int32),
        text_lengths=jnp.array([6, 4], jnp.int32),
        audio=jnp.asarray(rng.randn(2, 4096) * 0.1, jnp.float32),
        spec_lengths=jnp.array([16, 12], jnp.int32),
    )
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    state, m2 = step(state, batch, jax.random.PRNGKey(2))
    for name, value in {**m1, **m2}.items():
        assert np.isfinite(float(value)), name
    assert int(state.step) == 2
    # params actually changed
    w0 = state.params["enc_p"]["proj"]["weight"]
    assert np.abs(np.asarray(w0)).sum() > 0


def test_mesh_and_shardings():
    from mimic3_tpu.parallel import make_mesh, param_sharding

    mesh = make_mesh(n_devices=8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    params = {
        "enc_p": {
            "ffn_layers": {"0": {"conv_1": {
                "weight": jnp.zeros((3, 8, 16)),
                "bias": jnp.zeros((16,)),
            }}}
        },
        "dec": {"conv_pre": {"weight": jnp.zeros((7, 8, 16))}},
    }
    shardings = param_sharding(mesh, params, use_tp=True)
    ffn_spec = shardings["enc_p"]["ffn_layers"]["0"]["conv_1"][
        "weight"
    ].spec
    assert ffn_spec == jax.sharding.PartitionSpec(None, None, "tp")
    dec_spec = shardings["dec"]["conv_pre"]["weight"].spec
    assert dec_spec == jax.sharding.PartitionSpec()


def test_finetune_overlay_from_folded_weights():
    """Fine-tuning from a converted (folded-weight-norm) generator.npz:
    the overlay must preserve the training tree's weight_v/weight_g
    structure or the first optimizer update crashes on a pytree
    mismatch (regression: train_cli fine-tune path)."""
    from mimic3_tpu.models.vits.layers import conv_weight
    from mimic3_tpu.train_cli import merge_pretrained

    cfg = TrainingConfig()
    cfg.model = ModelConfig(
        num_symbols=40,
        n_layers=1,
        hidden_channels=32,
        inter_channels=32,
        filter_channels=64,
        upsample_initial_channel=64,
    )
    cfg.segment_size = 2048
    state = init_train_state(jax.random.PRNGKey(0), cfg)

    # simulate an ONNX-converted voice: every weight-normed conv folded
    def fold_tree(node):
        if isinstance(node, dict):
            if "weight_v" in node:
                out = {
                    k: v
                    for k, v in node.items()
                    if k not in ("weight_v", "weight_g")
                }
                out["weight"] = conv_weight(node)
                return out
            return {k: fold_tree(v) for k, v in node.items()}
        return node

    # inference npz holds only the synthesis modules
    pretrained = {
        k: fold_tree(state.params[k])
        for k in ("enc_p", "dp", "flow", "dec")
    }

    merged = merge_pretrained(dict(state.params), pretrained)
    # structure preserved: same treedef as the optimizer was built on
    assert jax.tree_util.tree_structure(
        merged
    ) == jax.tree_util.tree_structure(state.params)
    # values preserved: folded weights reproduce exactly
    w_ref = conv_weight(state.params["dec"]["ups"]["0"])
    w_got = conv_weight(merged["dec"]["ups"]["0"])
    assert np.allclose(np.asarray(w_ref), np.asarray(w_got), atol=1e-6)

    state = type(state)(
        params=merged,
        disc_params=state.disc_params,
        opt_g=state.opt_g,
        opt_d=state.opt_d,
        step=state.step,
    )
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    batch = TrainBatch(
        phoneme_ids=jnp.asarray(rng.randint(1, 40, (2, 6)), jnp.int32),
        text_lengths=jnp.array([6, 4], jnp.int32),
        audio=jnp.asarray(rng.randn(2, 4096) * 0.1, jnp.float32),
        spec_lengths=jnp.array([16, 12], jnp.int32),
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_g"]))
