"""Model forward + engine tests against the independent numpy reference."""
import numpy as np
import pytest

import ref_numpy_gemma
from gemma_tpu.gguf import GGMLType, GGUFReader
from gemma_tpu.models import GemmaConfig, load_params
from gemma_tpu.quant import dequantize
from gemma_tpu.runtime import Engine, EngineConfig, SamplingParams
from gemma_tpu.testing import TINY_CONFIG, make_gguf


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    make_gguf(path, TINY_CONFIG, weight_type=GGMLType.F32, seed=3)
    reader = GGUFReader(path)
    cfg, params = load_params(reader, mode="dequant")
    weights = {
        ti.name: dequantize(reader.tensor_raw(ti.name), ti.ggml_type, ti.shape)
        for ti in reader
    }
    return cfg, params, weights, reader


def test_config_from_gguf(tiny_model):
    cfg = tiny_model[0]
    assert cfg == TINY_CONFIG or (
        cfg.vocab_size == TINY_CONFIG.vocab_size
        and cfg.n_layers == TINY_CONFIG.n_layers
        and cfg.head_dim == TINY_CONFIG.head_dim
    )


def test_forward_matches_numpy_reference(tiny_model):
    cfg, params, weights, _ = tiny_model
    tokens = [1, 7, 300, 42, 260, 9]
    ref = ref_numpy_gemma.forward(weights, cfg, tokens)

    eng = Engine(cfg, params, EngineConfig(max_seq_len=32, donate_cache=False))
    cache = eng.new_cache(1)
    import jax.numpy as jnp

    logits, _ = eng._prefill_impl(
        params, jnp.asarray([tokens], jnp.int32), jnp.asarray([len(tokens)], jnp.int32), cache
    )
    # bf16 activations → tolerance scales with logit magnitude
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref[-1], atol=0.05 * np.abs(ref[-1]).max() + 1e-3
    )
    # argmax (the sampled token) must agree
    assert int(np.argmax(logits[0])) == int(np.argmax(ref[-1]))


def test_prefill_decode_equivalence(tiny_model):
    """Logits from incremental decode must match full-prefill logits —
    catches KV-cache/mask/RoPE offset bugs."""
    cfg, params, weights, _ = tiny_model
    tokens = [1, 7, 300, 42, 260, 9, 77, 5]
    eng = Engine(cfg, params, EngineConfig(max_seq_len=32, donate_cache=False))

    import jax.numpy as jnp

    # full prefill over n tokens
    full = ref_numpy_gemma.forward(weights, cfg, tokens)

    # prefill the first 3, then decode the rest one at a time
    logits, cache = eng.prefill([tokens[:3]])
    for t in range(3, len(tokens)):
        logits, cache = eng.decode_step(jnp.asarray([tokens[t]], jnp.int32), cache)
        ref = full[t]
        got = np.asarray(logits[0])
        np.testing.assert_allclose(got, ref, atol=0.05 * np.abs(ref).max() + 1e-3)


def test_generate_greedy_matches_reference_loop(tiny_model):
    cfg, params, weights, _ = tiny_model
    prompt = [1, 7, 300]
    eng = Engine(cfg, params, EngineConfig(max_seq_len=64, donate_cache=False))
    out = eng.generate([prompt], max_new_tokens=6)[0]

    # numpy greedy loop
    seq = list(prompt)
    for _ in range(6):
        logits = ref_numpy_gemma.forward(weights, cfg, seq)
        seq.append(int(np.argmax(logits[-1])))
    assert out == seq[len(prompt):]


def test_generate_fused_matches_host_loop(tiny_model):
    cfg, params, _, _ = tiny_model
    prompt = [1, 7, 300, 12]
    eng = Engine(cfg, params, EngineConfig(max_seq_len=64, donate_cache=False))
    host = eng.generate([prompt], max_new_tokens=5)[0]
    fused = eng.generate_fused([prompt], max_new_tokens=5)[0]
    assert host == list(fused)


def test_batched_generation_independent(tiny_model):
    """Sequences in a batch must not contaminate each other."""
    cfg, params, _, _ = tiny_model
    eng = Engine(cfg, params, EngineConfig(max_seq_len=64, max_batch=2, donate_cache=False))
    a = eng.generate([[1, 7, 300]], max_new_tokens=4)[0]
    b = eng.generate([[1, 44, 260, 9, 77]], max_new_tokens=4)[0]
    both = eng.generate([[1, 7, 300], [1, 44, 260, 9, 77]], max_new_tokens=4)
    assert both[0] == a
    assert both[1] == b


def test_quantized_params_close_to_float(tmp_path):
    cfg_q = GemmaConfig(
        vocab_size=512, d_model=256, n_layers=2, n_heads=4, n_kv_heads=2,
        head_dim=64, d_ff=256, context_length=128,
    )
    path = tmp_path / "q.gguf"
    make_gguf(path, cfg_q, weight_type=GGMLType.Q8_0, seed=5)
    reader = GGUFReader(path)
    cfg, qparams = load_params(reader, mode="quantized")
    _, fparams = load_params(reader, mode="dequant")
    engq = Engine(cfg, qparams, EngineConfig(max_seq_len=32, donate_cache=False))
    engf = Engine(cfg, fparams, EngineConfig(max_seq_len=32, donate_cache=False))
    lq, _ = engq.prefill([[1, 5, 300, 42]])
    lf, _ = engf.prefill([[1, 5, 300, 42]])
    lq, lf = np.asarray(lq[0]), np.asarray(lf[0])
    assert int(np.argmax(lq)) == int(np.argmax(lf))
    np.testing.assert_allclose(lq, lf, atol=0.1 * np.abs(lf).max() + 1e-3)


def test_int8_kv_cache_close(tiny_model):
    cfg, params, _, _ = tiny_model
    prompt = [1, 7, 300, 42]
    base = Engine(cfg, params, EngineConfig(max_seq_len=64, donate_cache=False))
    q8 = Engine(cfg, params, EngineConfig(max_seq_len=64, donate_cache=False, kv_quantized=True))
    lb, _ = base.prefill([prompt])
    lq, _ = q8.prefill([prompt])
    lb, lq = np.asarray(lb[0]), np.asarray(lq[0])
    assert int(np.argmax(lb)) == int(np.argmax(lq))


def test_generate_at_cache_capacity(tiny_model):
    """Fill the cache exactly to capacity: every decoded token's K/V must be
    written (a budget off-by-one would silently drop the final write and
    compute the last logits without the token's own K/V)."""
    cfg, params, weights, _ = tiny_model
    prompt = [1, 7, 300]
    S = 16
    eng = Engine(cfg, params, EngineConfig(max_seq_len=S, donate_cache=False))
    # ask for more than fits; generate must clamp to S - len(prompt) steps
    out = eng.generate([prompt], max_new_tokens=S)[0]
    assert len(out) == S - len(prompt)

    # numpy greedy loop for the same number of steps
    seq = list(prompt)
    for _ in range(S - len(prompt)):
        logits = ref_numpy_gemma.forward(weights, cfg, seq)
        seq.append(int(np.argmax(logits[-1])))
    assert out == seq[len(prompt):]


def test_generate_fused_rejects_over_capacity(tiny_model):
    cfg, params, _, _ = tiny_model
    eng = Engine(cfg, params, EngineConfig(max_seq_len=16, donate_cache=False))
    with pytest.raises(ValueError):
        eng.generate_fused([[1, 7, 300]], max_new_tokens=14)


def test_chunked_prefill_matches_monolithic(tiny_model):
    """Chunked prefill (fixed per-chunk shapes, offset positions) must give
    the same last-token logits and the same generation as one-shot prefill."""
    cfg, params, _, _ = tiny_model
    prompts = [[1, 7, 300, 42, 260, 9, 77, 5, 33, 2, 8] * 4,  # 44 tokens
               [1, 9, 4, 11]]
    eng = Engine(cfg, params, EngineConfig(max_seq_len=128, max_batch=2,
                                           donate_cache=False))
    l_mono, c_mono = eng.prefill(prompts)
    l_chunk, c_chunk = eng.prefill_chunked(prompts, chunk_size=16)
    np.testing.assert_allclose(
        np.asarray(l_chunk), np.asarray(l_mono), atol=2e-2, rtol=2e-2
    )
    assert int(np.argmax(l_chunk[0])) == int(np.argmax(l_mono[0]))
    assert int(np.argmax(l_chunk[1])) == int(np.argmax(l_mono[1]))
    np.testing.assert_array_equal(
        np.asarray(c_chunk.length), np.asarray(c_mono.length)
    )
    # full generation equality through the chunked path
    want = eng.generate_from(l_mono, c_mono, 6)
    got = eng.generate_from(l_chunk, c_chunk, 6)
    assert got == want


def test_engine_config_prefill_chunk_routing(tiny_model):
    """EngineConfig.prefill_chunk routes long prompts through chunks."""
    cfg, params, _, _ = tiny_model
    prompt = list(range(1, 41))
    base = Engine(cfg, params, EngineConfig(max_seq_len=128, donate_cache=False))
    chunked = Engine(cfg, params, EngineConfig(max_seq_len=128, donate_cache=False,
                                               prefill_chunk=16))
    want = base.generate([prompt], 5)
    got = chunked.generate([prompt], 5)
    assert got == want


def test_chunked_prefill_paged(tiny_model):
    """Chunked prefill writes page-aligned chunks into a paged cache."""
    cfg, params, _, _ = tiny_model
    prompt = list(range(1, 41))
    eng = Engine(cfg, params, EngineConfig(max_seq_len=128, donate_cache=False,
                                           paged=True, page_size=16,
                                           prefill_chunk=16))
    dense = Engine(cfg, params, EngineConfig(max_seq_len=128, donate_cache=False))
    got = eng.generate([prompt], 5)
    want = dense.generate([prompt], 5)
    assert got == want


def test_q5_k_checkpoint_loads_and_generates(tmp_path):
    """A checkpoint using formats WITHOUT device kernels (Q5_K here — what
    a user's q5_k_m file contains) must still load in quantized mode: such
    tensors fall back to bf16 dequant at load, kernel-format tensors keep
    their fused path, and generation matches the dequant-mode engine."""
    import numpy as np

    from gemma_tpu.gguf import GGMLType, GGUFReader
    from gemma_tpu.models import load_params
    from gemma_tpu.models.config import GemmaConfig
    from gemma_tpu.runtime import Engine, EngineConfig
    from gemma_tpu.testing import make_gguf

    cfg0 = GemmaConfig(  # K-quant superblocks need 256-multiple rows
        vocab_size=512, d_model=256, n_layers=2, n_heads=4, n_kv_heads=2,
        head_dim=64, d_ff=256, context_length=128,
    )
    path = make_gguf(tmp_path / "q5.gguf", cfg0,
                     weight_type=GGMLType.Q5_K, seed=9)
    cfg, qparams = load_params(GGUFReader(path), mode="quantized")
    cfg2, fparams = load_params(GGUFReader(path), mode="dequant")
    eq = Engine(cfg, qparams, EngineConfig(max_seq_len=64, donate_cache=False))
    ef = Engine(cfg2, fparams, EngineConfig(max_seq_len=64, donate_cache=False))
    prompt = [1, 7, 300, 42]
    a = eq.generate([prompt], max_new_tokens=6)[0]
    b = ef.generate([prompt], max_new_tokens=6)[0]
    assert a == b and len(a) == 6
