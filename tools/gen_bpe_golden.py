#!/usr/bin/env python3
"""Generate golden fixtures for graft.functions.BpeTokenizer.encodeWord
by running an INDEPENDENT implementation of the GPT-2 BPE merge
algorithm (the published encoder loop: pick the lowest-rank bigram
present, fuse every left-to-right non-overlapping occurrence, repeat)
over trained merge tables and boundary-case words.

The fixture pins two things at once:

1. GPT-2 semantics: `expected` comes from the batch-merge algorithm
   exactly as published (openai/gpt-2 encoder.py bpe()).
2. The Scala contract ("fuse ONE leftmost lowest-rank pair per
   iteration"): a single-merge twin is run on every case and asserted
   identical to the batch result before emission. For VALID merge
   tables (each merge's parts are previously-derived tokens or single
   characters — true of every trained table) the two are provably
   equivalent: the remaining occurrences of the chosen pair keep the
   minimum rank until exhausted, and newly created pairs always rank
   later. The assertion makes that argument executable.

Merge tables are TRAINED here (classic BPE: repeatedly fuse the most
frequent adjacent pair over a word corpus) so validity holds by
construction; an adversarial invalid table would diverge and is
deliberately out of contract (the scaladoc cites GPT-2, whose trained
artifacts are always valid).

Output: src/test/resources/golden/bpe_golden.jsonl with three record
types:
  {"table": name, "merges": [[a, b], ...]}
  {"word": w, "table": name, "expected": [...]}
  {"train": name, "corpus": [...], "n": k, "merges": [[a, b], ...]}
    — TRAINING goldens (round 8): the corpus (with duplicates — the
    trainer is instance-weighted) plus the merge table this
    independent train_merges implementation learns from it, for
    BpeTrainSpec to pin BpeTokenizer.train against.

Usage: python3 tools/gen_bpe_golden.py   (regenerates in place)
"""
import collections
import json
import os
import random

INF = float("inf")


# --------------------------------------------------- byte-level (GPT-2)
def bytes_to_unicode():
    """The PUBLISHED GPT-2 byte-to-unicode construction (openai/gpt-2
    encoder.py), re-derived: printable latin-1 bytes map to themselves,
    the other 68 shift to U+0100+n in byte-scan order."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


B2U = bytes_to_unicode()


def cp_units(w):
    return [c for c in w]  # Python strings iterate CODE POINTS


def byte_units(w):
    return [B2U[b] for b in w.encode("utf-8")]


# ---------------------------------------------------------------- GPT-2
def get_pairs(word):
    return set(zip(word, word[1:]))


def bpe_gpt2(token, ranks, units=cp_units):
    """The published GPT-2 batch-merge loop (independent re-write)."""
    word = tuple(units(token))
    if not word:
        return []
    pairs = get_pairs(word)
    if not pairs:
        return list(word)
    while True:
        bigram = min(pairs, key=lambda p: ranks.get(p, INF))
        if bigram not in ranks:
            break
        first, second = bigram
        new_word = []
        i = 0
        while i < len(word):
            try:
                j = word.index(first, i)
            except ValueError:
                new_word.extend(word[i:])
                break
            else:
                new_word.extend(word[i:j])
                i = j
            if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                new_word.append(first + second)
                i += 2
            else:
                new_word.append(word[i])
                i += 1
        word = tuple(new_word)
        if len(word) == 1:
            break
        pairs = get_pairs(word)
    return list(word)


# ------------------------------------------- single-merge twin (Scala contract)
def bpe_single(token, ranks, units=cp_units):
    parts = units(token)
    while len(parts) >= 2:
        best, best_rank = -1, INF
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]), INF)
            if r < best_rank:  # strict < => leftmost on (unreachable) ties
                best_rank, best = r, i
        if best < 0 or best_rank == INF:
            break
        parts = parts[:best] + [parts[best] + parts[best + 1]] + parts[best + 2:]
    return parts


# ------------------------------------------------------------- training
def train_merges(corpus, n_merges, units=cp_units):
    """Classic BPE training: fuse the globally most frequent adjacent
    pair (ties: lexicographic, for determinism) n_merges times."""
    words = [units(w) for w in corpus]
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for parts in words:
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for k, parts in enumerate(words):
            out, i = [], 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            words[k] = out
    return merges


def main():
    rng = random.Random(148)

    english = ("the quick brown fox jumps over the lazy dog and then "
               "another morning the sun rises on the northern shore there "
               "is more than one pattern in this corpus of ordinary words "
               "thinking rethinking interesting standing understanding "
               "internal international and other matters").split()
    repeats = ["aaa", "aaaa", "aaaaa", "abab", "ababab", "bcbc", "bcbcbc",
               "aabb", "abba", "banana", "bananas", "anana"]
    emoji = ["café", "naïve", "\U0001F600", "\U0001F600\U0001F600",
             "\U0001F600x\U0001F600", "x\U0001F680y", "\U0001D11Eclef",
             "你好世界", "\U00020000\U00020000ab"]

    tables = {
        # the exact table q148 ships (keep in sync with TextQueries.bpeMerges)
        "q148": [("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
                 ("an", "d"), ("o", "n"), ("r", "e"), ("a", "t"), ("o", "r")],
        "english50": train_merges(english, 50),
        "repeats12": train_merges(repeats, 12),
        "emoji8": train_merges(emoji, 8),
    }
    for name, merges in tables.items():
        assert len(set(merges)) == len(merges), f"duplicate pair in {name}"

    # word pool: corpus words, unseen words, boundaries
    unseen = ("zythum quartz jinx fjord sphinx waltz glyphs crwth "
              "strengths queueing rhythm").split()
    boundary = ["", "a", "z", "\U0001F600", "\U0001D11E", "9", ".", "-",
                "a1b2", "don't", "co-op", "x" * 40, "th" * 20, "ananana" * 3]
    pool = sorted(set(english + repeats + emoji + unseen + boundary))

    cases = []
    for tname in tables:
        ranks = {p: i for i, p in enumerate(tables[tname])}
        for w in pool:
            exp = bpe_gpt2(w, ranks)
            twin = bpe_single(w, ranks)
            assert exp == twin, (
                f"batch/single divergence table={tname} word={w!r}: "
                f"{exp} vs {twin}")
            cases.append({"word": w, "table": tname, "expected": exp})
    # plus randomized words over the english table for breadth
    ranks_en = {p: i for i, p in enumerate(tables["english50"])}
    alphabet = "abcdefghinorst"
    for _ in range(120):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        exp = bpe_gpt2(w, ranks_en)
        assert exp == bpe_single(w, ranks_en)
        cases.append({"word": w, "table": "english50", "expected": exp})

    # ---- BYTE-LEVEL mode (r9): the GPT-2 variant whose published
    # vocab round-trips — same loops, units = UTF-8 bytes through the
    # published byte-to-unicode table. Emoji/CJK exercise multi-byte
    # UTF-8 and the shifted (U+0100+) table range.
    byte_tables = {
        "english50_byte": train_merges(english, 50, byte_units),
        "emoji12_byte": train_merges(emoji, 12, byte_units),
    }
    for name, merges in byte_tables.items():
        assert len(set(merges)) == len(merges), f"duplicate pair in {name}"
    byte_cases = []
    for tname in byte_tables:
        ranks = {p: i for i, p in enumerate(byte_tables[tname])}
        for w in pool:
            exp = bpe_gpt2(w, ranks, byte_units)
            twin = bpe_single(w, ranks, byte_units)
            assert exp == twin, (
                f"byte batch/single divergence table={tname} word={w!r}")
            byte_cases.append({"word": w, "table": tname,
                               "mode": "byte", "expected": exp})

    # training goldens: corpora WITH duplicates (instance weighting must
    # matter — 'the' repeats in english), including a randomized one
    rand_corpus = ["".join(rng.choice("abcdest") for _ in range(rng.randint(1, 9)))
                   for _ in range(300)]
    # code-point vs UTF-16 tie-break (r8 ADVICE): every pair below ties
    # at count 1; code-point order ranks U+E001 < U+F8FF < U+10000 <
    # U+1F600, while UTF-16 code-unit order ranks the supplementary
    # pairs (surrogates 0xD800/0xD83D) BELOW [U+E000, U+FFFF] — a
    # trainer comparing UTF-16 units picks a different first merge.
    surrogate_tie = ["\uE001\uE001", "\U00010000\U00010000",
                     "\uF8FF\uF8FF", "\U0001F600\U0001F600"]
    train_specs = {
        "train_english": (english, 50),
        "train_repeats": (repeats, 12),
        "train_emoji": (emoji, 8),
        "train_random": (rand_corpus, 30),
        "train_surrogate_tie": (surrogate_tie, 4),
    }
    train_records = []
    for name, (corpus, k) in train_specs.items():
        train_records.append({"train": name, "corpus": corpus, "n": k,
                              "merges": [list(p) for p in train_merges(corpus, k)]})
    for name, (corpus, k) in {"train_english_byte": (english, 30),
                              "train_emoji_byte": (emoji, 12)}.items():
        train_records.append(
            {"train": name, "corpus": corpus, "n": k, "mode": "byte",
             "merges": [list(p) for p in train_merges(corpus, k, byte_units)]})

    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "golden",
                       "bpe_golden.jsonl")
    with open(out, "w", encoding="utf-8") as f:
        for name, merges in tables.items():
            f.write(json.dumps(
                {"table": name, "merges": [list(p) for p in merges]},
                ensure_ascii=False) + "\n")
        for name, merges in byte_tables.items():
            f.write(json.dumps(
                {"table": name, "mode": "byte",
                 "merges": [list(p) for p in merges]},
                ensure_ascii=False) + "\n")
        for c in cases + byte_cases:
            f.write(json.dumps(c, ensure_ascii=False) + "\n")
        for r in train_records:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"wrote {len(cases)} cp + {len(byte_cases)} byte cases over "
          f"{len(tables)}+{len(byte_tables)} tables and "
          f"{len(train_records)} train goldens to {out}")


if __name__ == "__main__":
    main()
