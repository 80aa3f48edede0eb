"""CLIP BPE tokenizer (diffusion/tokenizer.py): real BPE against a mini
vocab/merges fixture, the reference placeholder-index rule, and the
offline known-id fallback used when no SD checkpoint assets exist."""

import json

import numpy as np
import pytest

from textualdegremoval_tpu.diffusion.tokenizer import (
    BOS_ID, EOS_ID, PAD_ID, CLIPBPETokenizer, placeholder_index,
    tokenize_template,
)


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Mini CLIP-style BPE assets able to tokenize 'a photo of a s'.

    Ids mirror the real CLIP vocab where known (a=320, photo=1125, of=539)
    so the fallback table and the BPE path agree."""
    d = tmp_path_factory.mktemp("tokenizer")
    vocab = {
        "<|startoftext|>": 49406, "<|endoftext|>": 49407, "!": 0,
        "a</w>": 320, "photo</w>": 1125, "of</w>": 539, "s</w>": 338,
        # pieces for the unmergeable word 'xy' and partial merges
        "x": 10, "y</w>": 11, "p": 12, "h": 13, "o": 14, "t": 15,
        "f</w>": 16, "ph": 17, "pho": 18, "to</w>": 19, "o</w>": 20,
    }
    merges = [
        "p h",
        "ph o",
        "t o</w>",
        "pho to</w>",
        "o f</w>",
    ]
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(d)


class TestBPE:
    def test_template_ids(self, tok_dir):
        tok = CLIPBPETokenizer(tok_dir)
        assert tok.encode("a photo of a s") == [320, 1125, 539, 320, 338]

    def test_call_padding_and_specials(self, tok_dir):
        tok = CLIPBPETokenizer(tok_dir)
        ids = tok("a photo of a s", max_length=12)
        assert ids.shape == (1, 12)
        assert list(ids[0, :7]) == [49406, 320, 1125, 539, 320, 338, 49407]
        assert (ids[0, 7:] == 0).all()  # SD 2.x pads with '!' (id 0)

    def test_whitespace_and_case_normalized(self, tok_dir):
        tok = CLIPBPETokenizer(tok_dir)
        assert tok.encode("  A   PHOTO  ") == tok.encode("a photo")

    def test_empty(self, tok_dir):
        tok = CLIPBPETokenizer(tok_dir)
        assert tok.encode("") == []
        ids = tok("", max_length=5)
        assert list(ids[0]) == [49406, 49407, 0, 0, 0]

    def test_unmerged_word_splits(self, tok_dir):
        tok = CLIPBPETokenizer(tok_dir)
        assert tok.encode("xy") == [10, 11]

    def test_truncation(self, tok_dir):
        tok = CLIPBPETokenizer(tok_dir)
        ids = tok("a photo of a s", max_length=4)
        # BOS + first 2 tokens + EOS
        assert list(ids[0]) == [49406, 320, 1125, 49407]


class TestPlaceholderIndex:
    def test_reference_rule(self):
        # guidance_generation_dataset.py:186-196 — 1 + word position
        assert placeholder_index("a photo of a S") == 5
        assert placeholder_index("S") == 1
        assert placeholder_index("a photo of a clean S") == 6

    def test_missing_placeholder_raises(self):
        with pytest.raises(ValueError, match="not in"):
            placeholder_index("a photo of a cat")

    def test_premise_verified_with_tokenizer(self, tok_dir):
        tok = CLIPBPETokenizer(tok_dir)
        assert placeholder_index("a photo of a S", tokenizer=tok) == 5
        # 'xy' encodes to 2 tokens -> the word-position rule would inject at
        # the wrong embedding slot; must fail loudly
        with pytest.raises(ValueError, match="mis-place"):
            placeholder_index("a xy S", tokenizer=tok)


class TestTokenizeTemplate:
    def test_with_real_assets(self, tok_dir):
        ids, uncond, inj = tokenize_template(
            "a photo of a {}", tokenizer_path=tok_dir)
        assert inj == 5
        assert list(ids[0, :7]) == [49406, 320, 1125, 539, 320, 338, 49407]
        assert list(uncond[0, :2]) == [49406, 49407]

    def test_offline_fallback_matches_bpe_path(self, tok_dir):
        """The zero-egress fallback must agree with real tokenization on
        everything except the placeholder slot (whose embedding the splice
        overwrites)."""
        ids_f, unc_f, inj_f = tokenize_template("a photo of a S")
        ids_t, unc_t, inj_t = tokenize_template(
            "a photo of a S", tokenizer_path=tok_dir)
        assert inj_f == inj_t == 5
        mask = np.ones(77, bool)
        mask[inj_f] = False  # placeholder slot id is irrelevant post-splice
        np.testing.assert_array_equal(ids_f[0, mask], ids_t[0, mask])
        np.testing.assert_array_equal(unc_f, unc_t)

    def test_fallback_rejects_unknown_words(self):
        with pytest.raises(ValueError, match="known-id"):
            tokenize_template("a majestic photo of a S")

    def test_exports_consistent(self):
        from textualdegremoval_tpu.cli.generate_reference import (
            INJ_INDEX, PROMPT_TEMPLATE, tokenize,
        )
        assert INJ_INDEX == 5
        ids = tokenize(PROMPT_TEMPLATE)
        assert ids[0, 0] == BOS_ID and PAD_ID == 0 and EOS_ID == 49407
