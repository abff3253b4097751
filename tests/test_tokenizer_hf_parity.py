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


# ---------------------------------------------------------------------------
# Merge-order adversarial corpus (VERDICT r4 next #9): the trained-vocab
# differential above exercises realistic statistics; these assets are
# CRAFTED so that rank-priority application order is the only correct
# answer — greedy left-to-right or frequency-intuitive strategies produce
# different ids. Keeps the real-roberta-vocab risk bounded until egress
# allows pinning the released assets.
# ---------------------------------------------------------------------------

def _adversarial_assets(d):
    """Hand-built vocab/merges with maximally ambiguous overlaps:

    * ``bc`` outranks ``ab`` -> "abcd" must go a|bc|d, never ab|cd;
    * ``ab + c`` exists but is unreachable once ``bc`` fired;
    * identical-symbol merges ``aa``, then ``aa+aa`` -> "aaaa" collapses
      left-to-right within one rank sweep (HF's leftmost-first tie rule);
    * a LATER merge (``ef+ef``) whose pair only exists after an earlier
      merge creates it (re-scan after each application);
    * ``Ġ``-prefixed merges interacting with word-leading spaces;
    * a vocab hole: ``xy`` is a merge but NOT in vocab -> both tokenizers
      must emit <unk> for the merged piece (byte-fallback edge).
    """
    be = bytes_to_unicode()
    merges = [
        ("b", "c"),      # rank 0
        ("a", "bc"),     # rank 1: consumes rank-0's output
        ("a", "b"),      # rank 2: only fires when no "bc" possible
        ("ab", "c"),     # rank 3: unreachable via abc (bc wins) — but
                         # reachable in "abb c"? no: kept as a decoy
        ("a", "a"),      # rank 4
        ("aa", "aa"),    # rank 5: second-order identical merge
        ("e", "f"),      # rank 6
        ("ef", "ef"),    # rank 7: pair exists only post rank-6
        ("c", "d"),      # rank 8: loses to bc in "bcd" contexts
        ("Ġ", "a"),      # rank 9: space-prefixed unit
        ("Ġa", "bc"),    # rank 10: deep space-prefixed merge
        ("x", "y"),      # rank 11: merged piece NOT in vocab -> <unk>
        ("d", "e"),      # rank 12
        ("abc", "de"),   # rank 13: 2nd-order, crosses earlier outputs
    ]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in be.values():
        vocab.setdefault(ch, len(vocab))
    for a, b in merges:
        if (a, b) == ("x", "y"):
            continue  # deliberate vocab hole
        vocab.setdefault(a + b, len(vocab))
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return d


ADVERSARIAL_CAPTIONS = [
    "abcd",          # a|bc|d not ab|cd
    "abcde",         # rank-13 chain: abc+de
    "abcabc abcd",   # repeated + spaced (Ġa+bc path)
    "aaaa", "aaa", "aaaaa", "aaaaaa", "aaaaaaa",  # tie/overlap ladders
    "efef", "efefef", "efefefef",  # second-order repeats
    "xy xyxy x y",   # vocab-hole <unk> pieces
    "bcd cd abc",    # rank competition bc vs cd
    "ab abc bc",     # decoy rank-3 contexts
    " abc abc",      # leading space vs interior space
    "ababab",        # alternation: ab|ab|ab via rank 2
    "aabc baac caab", # aa vs bc orderings
    "abcdefef",      # long chain mixing every group
    "a b c d e f x y",  # singletons
]


def test_merge_order_adversarial_matches_hf(tmp_path):
    from transformers import RobertaTokenizer

    d = _adversarial_assets(str(tmp_path))
    ours = BPETokenizer.from_dir(d)
    hf = RobertaTokenizer(
        vocab_file=os.path.join(d, "vocab.json"),
        merges_file=os.path.join(d, "merges.txt"),
    )
    for caption in ADVERSARIAL_CAPTIONS:
        expected = hf(caption)["input_ids"]
        got = ours.encode(caption)
        assert got == expected, (
            f"merge-order divergence for {caption!r}:\n"
            f"  ours: {got}\n  hf:   {expected}"
        )


def test_merge_order_fuzz_matches_hf(tmp_path):
    """300 seeded random strings over the adversarial alphabet — the
    space of rank interleavings is too large to enumerate by hand."""
    import random

    from transformers import RobertaTokenizer

    d = _adversarial_assets(str(tmp_path))
    ours = BPETokenizer.from_dir(d)
    hf = RobertaTokenizer(
        vocab_file=os.path.join(d, "vocab.json"),
        merges_file=os.path.join(d, "merges.txt"),
    )
    rng = random.Random(1234)
    alphabet = "abcdefxy "
    for _ in range(300):
        n = rng.randint(1, 24)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        expected = hf(s)["input_ids"]
        got = ours.encode(s)
        assert got == expected, (
            f"fuzz divergence for {s!r}:\n  ours: {got}\n  hf: {expected}"
        )
