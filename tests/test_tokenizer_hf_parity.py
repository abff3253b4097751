"""Differential tokenizer test vs HuggingFace's slow (pure-python) RoBERTa
tokenizer (VERDICT r2 weak #2 / next-round #4).

The reference tokenizes captions with ``RobertaTokenizerFast``
(/root/reference/models/transformer.py:130-135). Our from-scratch byte-level
BPE had only ever been exercised against a hand-built 10-entry toy vocab; a
BPE edge-case bug (unicode, contractions, leading-space handling) would
silently shift every caption's token ids at real-checkpoint eval time.

Strategy: *train* a realistic BPE (hundreds of merges, standard RoBERTa
special-token layout) on a VidSTG-style caption corpus here in the test,
write standard vocab.json/merges.txt, load the SAME assets in both our
``BPETokenizer`` and ``transformers.RobertaTokenizer`` (slow — loads crafted
local files offline), and assert identical ids over a corpus of captions
covering contractions, digit runs, punctuation runs, unicode letters,
non-decimal numerals, underscores, and whitespace shapes.
"""

import json
import os

import pytest

from tubedetr_tpu.models.tokenizer import BPETokenizer, bytes_to_unicode

# VidSTG-style sentences plus deliberately nasty shapes
TRAIN_CORPUS = [
    "what does the man in the white shirt hold in his hand",
    "there is a brown dog running towards the child on the lawn",
    "the woman in red rides a black bicycle down the street",
    "who is the adult holding the baby in the yellow blanket",
    "a small cat jumps onto the wooden table near the window",
    "the boy throws a blue ball to the dog in the park",
    "what is beneath the large umbrella next to the ice cream cart",
    "the player with number 23 dribbles the basketball quickly",
    "it's the girl who doesn't wave while they're dancing",
    "a café chair, a naïve reply — 3 croissants for 12.50!",
]

# widen pair statistics so the trainer can find a few hundred merges with
# frequency >= 2 (VidSTG-style grammar over a larger noun/verb inventory)
_SUBJECTS = [
    "the man", "the woman", "a child", "the player", "an adult",
    "the girl", "the boy", "a person", "the rider", "the dancer",
]
_VERBS = [
    "holds", "throws", "catches", "watches", "touches", "lifts",
    "pushes", "pulls", "carries", "follows",
]
_OBJECTS = [
    "a yellow ball", "the wooden chair", "a black bicycle",
    "the white bottle", "a small camera", "the heavy box",
    "a green balloon", "the silver laptop", "a striped umbrella",
    "the plastic cup",
]
_PLACES = [
    "in the kitchen", "near the window", "on the street",
    "behind the fence", "under the bridge", "at the playground",
    "beside the river", "inside the room", "outside the store",
    "next to the car",
]
for _i in range(120):
    TRAIN_CORPUS.append(
        f"{_SUBJECTS[_i % 10]} {_VERBS[(_i // 10) % 10]} "
        f"{_OBJECTS[(_i // 3) % 10]} {_PLACES[(_i // 7) % 10]}"
    )

EVAL_CAPTIONS = TRAIN_CORPUS + [
    # contractions in every supported form
    "don't it's we'll they've i'm you're he'd",
    # digit runs, decimals, mixed alphanumerics
    "route 66 at 1080p costs 1,234.56 dollars x42",
    # punctuation runs incl. underscore (the \\w/\\p{L} trap)
    "wait... what?! a_b __init__ --flag <tag> [ok]",
    # unicode letters / accents / non-latin scripts
    "café naïve über straße 日本語 привет",
    # non-decimal numerals (\\p{N} vs \\d)
    "chapter Ⅲ section ① page 7",
    # whitespace shapes: leading, trailing, doubled, tabs
    "  leading and trailing  ",
    "double  space\tand tab",
    "",
    "a",
    " a",
]


def _train_bpe(corpus, n_merges=300):
    """Minimal byte-level BPE trainer (frequency-greedy, the GPT-2 scheme):
    returns (vocab, merges) in the standard asset layout — specials at
    0..3, then the 256 byte symbols, then one vocab entry per merge."""
    from collections import Counter

    from tubedetr_tpu.models.tokenizer import _word_tokenize

    be = bytes_to_unicode()
    words = Counter()
    for line in corpus:
        for tok in _word_tokenize(line):
            mapped = tuple(be[b] for b in tok.encode("utf-8"))
            words[mapped] += 1

    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for word, freq in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        # deterministic tie-break so the assets are reproducible
        (a, b), freq = max(
            pairs.items(), key=lambda kv: (kv[1], kv[0])
        )
        if freq < 2:
            break
        merges.append((a, b))
        new_words = Counter()
        for word, f in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == (a, b):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += f
        words = new_words

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in be.values():
        vocab.setdefault(ch, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab.setdefault("<mask>", len(vocab))
    return vocab, merges


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok_assets")
    vocab, merges = _train_bpe(TRAIN_CORPUS)
    assert len(merges) > 100, "trainer should produce a realistic merge table"
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


def test_ids_match_hf_roberta_slow(assets):
    from transformers import RobertaTokenizer

    ours = BPETokenizer.from_dir(assets)
    hf = RobertaTokenizer(
        vocab_file=os.path.join(assets, "vocab.json"),
        merges_file=os.path.join(assets, "merges.txt"),
    )
    for caption in EVAL_CAPTIONS:
        expected = hf(caption)["input_ids"]
        got = ours.encode(caption)
        assert got == expected, (
            f"token ids diverge from HF for {caption!r}:\n"
            f"  ours: {got}\n  hf:   {expected}"
        )


def test_ids_match_hf_without_specials(assets):
    from transformers import RobertaTokenizer

    ours = BPETokenizer.from_dir(assets)
    hf = RobertaTokenizer(
        vocab_file=os.path.join(assets, "vocab.json"),
        merges_file=os.path.join(assets, "merges.txt"),
    )
    for caption in EVAL_CAPTIONS:
        expected = hf(caption, add_special_tokens=False)["input_ids"]
        assert ours.encode(caption, add_special=False) == expected


def test_asset_fingerprint(assets):
    fp = BPETokenizer.fingerprint_assets(assets)
    assert set(fp) == {"vocab.json", "merges.txt"}
    assert all(len(v) == 64 for v in fp.values())
    # stable across calls (verification hook for dropped-in real assets)
    assert BPETokenizer.fingerprint_assets(assets) == fp
