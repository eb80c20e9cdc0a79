"""UALM core: vocab, delay interleave, preprocessor, backbone, loss."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.vocab import (
    build_vocabulary,
    build_loss_intervals,
    NUM_SPECIAL_TOKENS,
)
from audio_intelligence_tpu.models.ualm.interleave import (
    delay_interleave,
    delay_deinterleave,
)
from audio_intelligence_tpu.models.ualm.preprocessor import UALMPreprocessor, pad_list
from audio_intelligence_tpu.models.ualm.backbone import (
    BackboneConfig,
    QwenBackbone,
    KVCache,
    segment_ids_from_positions,
)
from audio_intelligence_tpu.models.ualm.lm import ParallelLM, multistream_loss


class FakeTextIO:
    modality = "text"
    is_discrete = True

    def num_stream(self):
        return 1

    def get_vocabulary(self):
        return [f"tok{i}" for i in range(10)]

    def get_stream_interval(self):
        return [(0, 10)]

    def find_length(self, data):
        return len(data)

    def preprocess(self, data):
        seq = np.asarray(data, np.int64)[:, None]
        return seq, None, np.ones_like(seq, np.float32)


class FakeCodecIO:
    modality = "audio"
    is_discrete = True

    def num_stream(self):
        return 4

    def get_vocabulary(self):
        return [f"a{s}_{i}" for s in range(4) for i in range(8)]

    def get_stream_interval(self):
        return [(s * 8, (s + 1) * 8) for s in range(4)]

    def find_length(self, data):
        return data["frames"] + self.num_stream() - 1

    def preprocess(self, data):
        t = data["frames"]
        seq = np.stack(
            [np.arange(t) % 8 + s * 8 for s in range(4)], axis=1
        ).astype(np.int64)
        return seq, None, np.ones_like(seq, np.float32)


def make_pre(**kw):
    ios = {"text": FakeTextIO(), "discrete_audio": FakeCodecIO()}
    vocab, intervals = build_vocabulary(ios)
    defaults = dict(
        multimodal_io=ios,
        vocab=vocab,
        vocab_intervals=intervals,
        audio_input="discrete_audio",
        audio_output="discrete_audio",
    )
    defaults.update(kw)
    return UALMPreprocessor(**defaults), vocab, intervals


def test_vocab_layout():
    _, vocab, intervals = make_pre()
    assert vocab[0] == "<|pad|>" and vocab[1] == "<|bos|>"
    assert len(set(vocab)) == len(vocab)
    assert intervals["text"] == [(256, 266)]
    assert intervals["discrete_audio"][0] == (266, 274)
    assert intervals["discrete_audio"][-1] == (290, 298)
    li = build_loss_intervals(intervals)
    assert li == [(266, 298)]
    # reference splits at the first interval whose end exceeds the budget
    # (UALM parallel.py:157-170), so chunks may exceed max by one interval
    li2 = build_loss_intervals(intervals, max_loss_interval=8)
    assert li2 == [(266, 282), (282, 298)]


def test_delay_interleave_roundtrip_and_reference_layout():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 8, (2, 6, 4)).astype(np.int64)
    pads = [100, 200, 300, 400]
    inter = delay_interleave(codes, pads)
    assert inter.shape == (2, 9, 4)
    # stream n delayed by n; vacated slots take that stream's pad
    np.testing.assert_array_equal(inter[:, 0, 1], 200)
    np.testing.assert_array_equal(inter[:, 0, 3], 400)
    np.testing.assert_array_equal(inter[:, 0, 0], codes[:, 0, 0])
    np.testing.assert_array_equal(inter[:, 1, 1], codes[:, 0, 1])
    back = delay_deinterleave(inter)
    np.testing.assert_array_equal(back, codes)


def test_preprocessor_sequence_structure():
    pre, vocab, intervals = make_pre()
    key = ("caption_to_audio", "ds", "id0")
    data = {"text1": [1, 2, 3], "audio1": {"frames": 5}}
    out = pre.preprocessing(key, data, np.random.default_rng(0))
    seq, mask = out["sequence"], out["loss_mask"]
    # bos + (user: 2 specials + 3 + eos) + (assistant: 2 specials + 5 + eos)
    assert seq.shape == (1 + 6 + 8, 4)
    assert mask.shape == seq.shape
    bos = vocab.index("<|bos|>")
    assert seq[0, 0] == bos and (seq[0, 1:] == 0).all()
    assert vocab[seq[1, 0]] == "<|user|>"
    assert vocab[seq[2, 0]] == "<|text|>"
    # text tokens offset by text interval start, other streams zero-padded
    np.testing.assert_array_equal(seq[3:6, 0], np.asarray([1, 2, 3]) + 256)
    assert (seq[3:6, 1:] == 0).all()
    assert vocab[seq[6, 0]] == "<|eos|>"
    assert vocab[seq[7, 0]] == "<|assistant|>"
    assert vocab[seq[8, 0]] == "<|audio|>"
    # audio tokens offset by the audio interval start for ALL streams;
    # local id 0 collides with the pad check and stays 0 — reference
    # behavior (ualm_job.py:370-374): discrete-audio preprocess emits pad
    # placeholders that are filled by encode_batch at embed time.
    assert seq[9, 0] == 0
    assert (seq[10:14, 0] >= 266).all()
    # loss only on assistant: user content mask 0, assistant content mask 1
    assert (mask[1:7] == 0).all()
    assert mask[7, 0] == 1.0 and mask[9:14].all()


def test_preprocessor_eot_between_same_role():
    pre, vocab, _ = make_pre()
    key = ("audio_to_caption", "ds", "id0")
    data = {"text1": [1], "audio1": {"frames": 2}, "text2": [4, 5]}
    out = pre.preprocessing(key, data, np.random.default_rng(0))
    toks = [vocab[t] for t in out["sequence"][:, 0]]
    # user(text) then user(audio) → first ends with <|eot|>, second with <|eos|>
    assert "<|eot|>" in toks
    assert toks.count("<|eos|>") == 2  # second user msg + assistant msg


def test_preprocessor_cfg_dropout_zeroes_all_but_audio():
    pre, vocab, _ = make_pre(audio_cfg=1.0, is_train=True)
    key = ("caption_to_audio", "ds", "id0")
    data = {"text1": [1, 2, 3], "audio1": {"frames": 5}}
    out = pre.preprocessing(key, data, np.random.default_rng(0))
    seq = out["sequence"]
    # user segment (indices 1..6) zeroed, bos zeroed
    assert (seq[0] == 0).all()
    assert (seq[1:7] == 0).all()
    # assistant audio segment kept (local id 0 stays 0, see structure test)
    assert (seq[10:14, 0] >= 266).all()


def test_collate_bucket_and_pack():
    pre, _, _ = make_pre()
    key = ("text_only", "ds", "i")
    batch = [
        (key, {"text1": [1, 2], "text2": [3]}),
        (key, {"text1": [1], "text2": [3, 4, 5]}),
    ]
    out = pre.collate_fn(batch, np.random.default_rng(0))
    assert out["seqs"].shape[0] == 2
    assert out["seqs"].shape == out["loss_masks"].shape

    pre2, _, _ = make_pre(batchfy_method="pack")
    out2 = pre2.collate_fn(batch, np.random.default_rng(0))
    assert out2["seqs"].shape[0] == 1
    assert "position_ids" in out2
    pos = out2["position_ids"][0]
    assert (pos[:1] == 0).all()
    # position ids restart at the second document
    assert (pos == 0).sum() == 2


def test_backbone_causality():
    cfg = BackboneConfig.tiny()
    model = QwenBackbone(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out1 = model.apply(params, x)
    # changing a future token must not affect earlier outputs
    x2 = x.at[:, 5:].set(0.0)
    out2 = model.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), atol=1e-5
    )
    assert np.abs(np.asarray(out1[:, 5:] - out2[:, 5:])).max() > 1e-6


def test_backbone_segment_isolation():
    """Packed documents must not attend across the boundary."""
    cfg = BackboneConfig.tiny()
    model = QwenBackbone(cfg)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 4, cfg.hidden_size)).astype(np.float32)
    b = rng.standard_normal((1, 4, cfg.hidden_size)).astype(np.float32)
    packed = jnp.asarray(np.concatenate([a, b], axis=1))
    pos = jnp.asarray([[0, 1, 2, 3, 0, 1, 2, 3]])
    params = model.init(jax.random.PRNGKey(0), packed, pos)
    out_packed = model.apply(params, packed, pos)
    out_b_alone = model.apply(params, jnp.asarray(b), jnp.asarray([[0, 1, 2, 3]]))
    np.testing.assert_allclose(
        np.asarray(out_packed[:, 4:]), np.asarray(out_b_alone), atol=1e-4
    )
    assert np.asarray(segment_ids_from_positions(pos)).tolist() == [[1, 1, 1, 1, 2, 2, 2, 2]]


def test_backbone_kv_cache_matches_full():
    cfg = BackboneConfig.tiny()
    model = QwenBackbone(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 6, cfg.hidden_size)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(params, x)

    cache = KVCache.init(cfg, 1, 8)
    # prefill 4, then decode 2 one at a time
    pos = jnp.arange(6)[None]
    h, cache = model.apply(params, x[:, :4], pos[:, :4], cache)
    outs = [h]
    for i in range(4, 6):
        h, cache = model.apply(params, x[:, i : i + 1], pos[:, i : i + 1], cache)
        outs.append(h)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=2e-4)


def test_multistream_loss_matches_torch_reference():
    """Dense-masked interval softmax == the reference's gather formulation."""
    cfg = BackboneConfig.tiny()
    vocab_size = 64
    model = ParallelLM(cfg=cfg, vocab_size=vocab_size, num_stream=3)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 20, (2, 6, 3)).astype(np.int64)
    ids[:, :, 1:] = rng.integers(30, 50, (2, 6, 2))  # interval tokens
    mask = (rng.random((2, 6, 3)) > 0.3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    loss_intervals = [(30, 40), (40, 50)]
    loss, stats = multistream_loss(
        model, variables, jnp.asarray(ids), jnp.asarray(mask), loss_intervals
    )
    assert np.isfinite(float(loss))

    # torch oracle on the same hidden states / lm_head
    sh = model.apply(variables, jnp.asarray(ids))
    h = torch.from_numpy(np.asarray(sh[:, :-1], np.float64))
    W = torch.from_numpy(
        np.asarray(variables["params"]["lm_head_kernel"], np.float64)
    )  # [H, V]
    t_ids = torch.from_numpy(ids[:, 1:])
    t_mask = torch.from_numpy(mask[:, 1:].astype(np.float64))
    loss_t = torch.zeros_like(t_mask)
    logits0 = h[:, :, 0] @ W
    ce0 = torch.nn.functional.cross_entropy(
        logits0.reshape(-1, vocab_size), t_ids[:, :, 0].reshape(-1),
        reduction="none", ignore_index=0,
    ).reshape(t_ids[:, :, 0].shape)
    loss_t[:, :, 0] = ce0
    resid = t_ids[:, :, 1:]
    for start, end in loss_intervals:
        m = (resid >= start) & (resid < end)
        if m.sum() == 0:
            continue
        lg = h[:, :, 1:][m] @ W[:, start:end]
        tg = resid[m] - start
        ce = torch.nn.functional.cross_entropy(lg, tg, reduction="none")
        loss_t[:, :, 1:][m] = ce
    loss_t = loss_t * t_mask
    ref = float(loss_t.sum() / (t_mask[:, :, 0] != 0).double().sum())
    np.testing.assert_allclose(float(loss), ref, rtol=2e-3)


def test_multistream_loss_time_chunked_matches_unchunked():
    """time_chunk streams the CE over time blocks (the 16k-bucket memory
    enabler) — value and gradients must match the unchunked path,
    including a T that does not divide the chunk (padding leg)."""
    cfg = BackboneConfig.tiny()
    model = ParallelLM(cfg=cfg, vocab_size=64, num_stream=3)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 20, (2, 11, 3)).astype(np.int64)
    ids[:, :, 1:] = rng.integers(30, 50, (2, 11, 2))
    mask = (rng.random((2, 11, 3)) > 0.3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    intervals = [(30, 40), (40, 50)]

    def loss_of(params, chunk):
        v = {"params": params}
        loss, _ = multistream_loss(
            model, v, jnp.asarray(ids), jnp.asarray(mask), intervals,
            time_chunk=chunk, compute_acc=True,
        )
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_of)(variables["params"], None)
    l_chk, g_chk = jax.value_and_grad(loss_of)(variables["params"], 4)
    np.testing.assert_allclose(float(l_chk), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_chk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # stats parity too (per-stream CE + acc)
    _, s_ref = multistream_loss(
        model, variables, jnp.asarray(ids), jnp.asarray(mask), intervals,
        compute_acc=True,
    )
    _, s_chk = multistream_loss(
        model, variables, jnp.asarray(ids), jnp.asarray(mask), intervals,
        time_chunk=4, compute_acc=True,
    )
    for k in s_ref:
        np.testing.assert_allclose(
            float(s_chk[k]), float(s_ref[k]), rtol=1e-4, err_msg=k
        )


def test_backbone_remat_matches_plain():
    """cfg.remat=True (per-layer activation checkpointing for the 16k
    bucket) is numerics-neutral in both forward and gradient."""
    cfg = BackboneConfig.tiny()
    cfg_r = BackboneConfig(**{**cfg.__dict__, "remat": True})
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 12, cfg.hidden_size)), jnp.float32)
    variables = QwenBackbone(cfg).init(jax.random.PRNGKey(0), x)

    def loss(params, c):
        out = QwenBackbone(c).apply(params, x)
        return jnp.mean(out ** 2)

    l0, g0 = jax.value_and_grad(loss)(variables, cfg)
    l1, g1 = jax.value_and_grad(loss)(variables, cfg_r)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
