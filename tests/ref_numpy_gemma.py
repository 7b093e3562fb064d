"""Independent numpy reference implementation of the Gemma forward pass.

Deliberately written straight from the architecture definition (not via the
framework's own ops) so tests/test_model.py can golden-diff the JAX engine
against it — the same differential-testing pattern the reference uses
against llama.cpp (SURVEY.md §4), with this file playing llama.cpp's role.
"""
import numpy as np


def rms_norm(x, w, eps):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps)) * w


def rope_neox(x, positions, base, pos_scale=1.0):
    # x: [T, H, D]
    T, H, D = x.shape
    half = D // 2
    freqs = base ** (-np.arange(half) / half)
    theta = (positions * pos_scale)[:, None, None] * freqs[None, None, :]
    cos, sin = np.cos(theta), np.sin(theta)
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def forward(weights, cfg, tokens):
    """weights: dict of float32 numpy arrays keyed by GGUF tensor names.
    tokens: [T] int. Returns logits [T, vocab] float32.

    Covers Gemma-1 and Gemma-2 semantics: sandwich norms (applied when the
    post_attention_norm / post_ffw_norm tensors exist), attention and final
    logit softcapping, and per-layer sliding-window masks."""
    T = len(tokens)
    D = cfg.d_model
    positions = np.arange(T)
    x = weights["token_embd.weight"][tokens] * np.sqrt(D)
    for i in range(cfg.n_layers):
        w = lambda n: weights[f"blk.{i}.{n}.weight"]
        has = lambda n: f"blk.{i}.{n}.weight" in weights
        window = cfg.layer_window(i)
        h = rms_norm(x, w("attn_norm"), cfg.rms_eps)
        q = (h @ w("attn_q").T).reshape(T, cfg.n_heads, cfg.head_dim)
        k = (h @ w("attn_k").T).reshape(T, cfg.n_kv_heads, cfg.head_dim)
        v = (h @ w("attn_v").T).reshape(T, cfg.n_kv_heads, cfg.head_dim)
        if has("attn_q_norm"):  # Gemma-3 per-head QK-norm, before RoPE
            q = rms_norm(q, w("attn_q_norm"), cfg.rms_eps)
            k = rms_norm(k, w("attn_k_norm"), cfg.rms_eps)
        base, pos_scale = cfg.layer_rope(i) if hasattr(cfg, "layer_rope") else (cfg.rope_base, 1.0)
        q = rope_neox(q, positions, base, pos_scale) * cfg.effective_query_scale
        k = rope_neox(k, positions, base, pos_scale)
        group = cfg.n_heads // cfg.n_kv_heads
        mask = np.tril(np.ones((T, T), bool))
        if window > 0:  # key j visible to query t iff t-window < j <= t
            mask &= positions[None, :] > positions[:, None] - window
        outs = []
        for hq in range(cfg.n_heads):
            hk = hq // group
            scores = q[:, hq] @ k[:, hk].T  # [T, T]
            if cfg.attn_softcap:
                scores = cfg.attn_softcap * np.tanh(scores / cfg.attn_softcap)
            scores = np.where(mask, scores, -np.inf)
            p = np.exp(scores - scores.max(axis=-1, keepdims=True))
            p /= p.sum(axis=-1, keepdims=True)
            outs.append(p @ v[:, hk])
        attn = np.stack(outs, axis=1).reshape(T, cfg.n_heads * cfg.head_dim)
        attn_out = attn @ w("attn_output").T
        if has("post_attention_norm"):
            attn_out = rms_norm(attn_out, w("post_attention_norm"), cfg.rms_eps)
        x = x + attn_out
        h2 = rms_norm(x, w("ffn_norm"), cfg.rms_eps)
        ff = (gelu_tanh(h2 @ w("ffn_gate").T) * (h2 @ w("ffn_up").T)) @ w("ffn_down").T
        if has("post_ffw_norm"):
            ff = rms_norm(ff, w("post_ffw_norm"), cfg.rms_eps)
        x = x + ff
    x = rms_norm(x, weights["output_norm.weight"], cfg.rms_eps)
    logits = (x @ weights["token_embd.weight"].T).astype(np.float32)
    if cfg.final_softcap:
        logits = cfg.final_softcap * np.tanh(logits / cfg.final_softcap)
    return logits
