"""CLI end-to-end tests over a synthetic GGUF checkpoint (tiny config)."""
import json

import pytest

from gemma_tpu import cli
from gemma_tpu.testing import TINY_CONFIG, make_gguf


@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    return str(make_gguf(tmp_path_factory.mktemp("cli") / "tiny.gguf"))


def test_generate_greedy(gguf_path, capsys):
    rc = cli.main([
        "generate", gguf_path, "--prompt", "abab", "--max-new-tokens", "8",
        "--max-seq-len", "64", "--no-eos",
    ])
    assert rc == 0
    out = capsys.readouterr()
    assert "decode" in out.err and "tok/s" in out.err


def test_generate_stream_sampled(gguf_path, capsys):
    rc = cli.main([
        "generate", gguf_path, "--prompt", "ab", "--max-new-tokens", "4",
        "--max-seq-len", "64", "--stream", "--temperature", "0.8",
        "--top-k", "5", "--seed", "7", "--no-eos",
    ])
    assert rc == 0


def test_generate_tokens_flag_and_paged(gguf_path):
    rc = cli.main([
        "generate", gguf_path, "--tokens", "1,5,9", "--max-new-tokens", "4",
        "--max-seq-len", "64", "--paged", "--page-size", "8", "--no-eos",
    ])
    assert rc == 0


def test_generate_prompt_too_long(gguf_path):
    rc = cli.main([
        "generate", gguf_path, "--tokens", ",".join(["5"] * 64),
        "--max-seq-len", "64",
    ])
    assert rc == 2


def test_inspect(gguf_path, capsys):
    assert cli.main(["inspect", gguf_path]) == 0
    out = capsys.readouterr().out
    assert "architecture: gemma" in out
    assert "token_embd.weight" in out


def test_inspect_json(gguf_path, capsys):
    assert cli.main(["inspect", gguf_path, "--json"]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["architecture"] == "gemma"
    assert "token_embd.weight" in meta["tensors"]


def test_perplexity(gguf_path, tmp_path, capsys):
    corpus = tmp_path / "c.txt"
    corpus.write_text("abab bab ab abba " * 8)
    rc = cli.main(["perplexity", gguf_path, "--text-file", str(corpus), "--window", "32"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert res["perplexity"] > 0 and res["tokens"] > 0


def test_bench_tiny(gguf_path, capsys):
    rc = cli.main([
        "bench", gguf_path, "--max-new-tokens", "4", "--max-seq-len", "64",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert res["value"] > 0


def test_serve(gguf_path, tmp_path, capsys):
    pf = tmp_path / "prompts.txt"
    pf.write_text("hello world\nthe hello\nworld\n")
    rc = cli.main([
        "serve", str(gguf_path), "--prompts-file", str(pf),
        "--batch", "2", "--max-new-tokens", "4", "--block", "2",
        "--max-seq-len", "64", "--no-eos",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(ln) for ln in out]
    assert len(rows) == 3
    assert all(r["tokens"] == 4 for r in rows)
    assert [r["id"] for r in rows] == ["r0", "r1", "r2"]


def test_quantize_roundtrip(tmp_path, capsys):
    """Native re-quantization: f32 GGUF -> q4_0 GGUF -> same greedy tokens
    as loading the f32 checkpoint and quantizing in-process."""
    from gemma_tpu.gguf import GGMLType, GGUFReader
    from gemma_tpu.models import load_params
    from gemma_tpu.runtime import Engine, EngineConfig

    cfg_path = make_gguf(tmp_path / "f32.gguf", TINY_CONFIG,
                         weight_type=GGMLType.F32, seed=3)
    out = tmp_path / "q4.gguf"
    rc = cli.main(["quantize", str(cfg_path), str(out), "--type", "q4_0"])
    assert rc == 0
    r = GGUFReader(out)
    assert r.tensors["token_embd.weight"].ggml_type == GGMLType.Q4_0
    assert r.tensors["output_norm.weight"].ggml_type == GGMLType.F32
    # vocab metadata survived the round trip
    cfg, params = load_params(r)
    eng = Engine(cfg, params, EngineConfig(max_seq_len=64, donate_cache=False))
    toks = eng.generate([[1, 7, 33]], 4)[0]
    assert len(toks) == 4 and all(0 <= t < cfg.vocab_size for t in toks)


def test_quantize_mixed_q4_k_m(tmp_path):
    from gemma_tpu.gguf import GGMLType, GGUFReader
    from gemma_tpu.models.config import GemmaConfig

    cfg = GemmaConfig(vocab_size=512, d_model=256, n_layers=1, n_heads=2,
                      n_kv_heads=1, head_dim=128, d_ff=512, context_length=64)
    src = make_gguf(tmp_path / "src.gguf", cfg, weight_type=GGMLType.F32)
    out = tmp_path / "m.gguf"
    assert cli.main(["quantize", str(src), str(out), "--type", "q4_k_m"]) == 0
    r = GGUFReader(out)
    assert r.tensors["token_embd.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q4_K
