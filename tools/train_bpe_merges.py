"""Learn a BPE merges table from a parquet text corpus and write it
in the PUBLIC merges format (one ``left right`` pair per line,
``#version`` header) — the file `operators/bpe.py::load_merges` and
``cli corpus-stats --bpe --merges PATH`` consume.

Algorithm: the original subword-BPE trainer (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units"):
start from characters, repeatedly merge the most frequent adjacent
symbol pair across the word-frequency vocabulary.  Pair statistics
update INCREMENTALLY (only words containing the merged pair are
touched, found via a pair→words index) with a lazy-invalidation heap
for the argmax — n_merges·O(affected) rather than n_merges·O(|pairs|).
Ties break deterministically (count, then lexicographic pair), so the
table is reproducible byte-for-byte.

The driver-generated test corpora have TINY closed vocabularies (31
distinct words at sf0.1 — training saturates after ~100 merges when
every word is a single symbol), so ``--fill-synthetic`` extends a
saturated table to the requested size with a deterministic
letter-lattice (every 2-letter pair, then lattice 3- and 4-letter
extensions) — each line still a structurally valid merge of two
previously-constructible symbols, giving the 32k-entry table the
Arrow encoder's scale smoke needs.  On a real corpus the trainer
never saturates and the filler stays unused.

Usage:
  python tools/train_bpe_merges.py --input PATH.parquet --out merges.txt
         [--text-col text] [--n 32768] [--byte-level] [--fill-synthetic]
"""

from __future__ import annotations

import argparse
import heapq
import os
import string
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def word_frequencies(path: str, text_col: str) -> Counter:
    """Word-frequency dict over the corpus, using the ENGINE's word
    normalization (lower + non-alnum→space) so trained tokens line up
    with what bpe_token_counts will see."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        rf"""
SELECT word, count(*) FROM (
  SELECT unnest(string_split_regex(trim(regexp_replace(lower({text_col}),
         '[^a-z0-9\x80-\x{{ffff}}-]+', ' ', 'g')), '\s+')) AS word
  FROM read_parquet(?)
  WHERE trim(regexp_replace(lower({text_col}),
        '[^a-z0-9\x80-\x{{ffff}}-]+', ' ', 'g')) != ''
) GROUP BY 1
""",
        [path],
    ).fetchall()
    return Counter(dict(rows))


def learn_bpe(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Sennrich-style BPE: returns up to ``n_merges`` (left, right)
    pairs in learned order (stops early when no pair occurs twice)."""
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in sorted(word_freq.items()):
        if len(w) >= 2:
            words.append(list(w))
            freqs.append(f)

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(wi)

    # lazy-invalidation heap: (-count, pair); stale entries are
    # dropped on pop by re-checking pair_counts
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def bump(pair: tuple[str, str], delta: int, wi: int) -> None:
        pair_counts[pair] += delta
        if delta > 0:
            pair_words[pair].add(wi)
            heapq.heappush(heap, (-pair_counts[pair], pair))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg, best = heapq.heappop(heap)
        cnt = pair_counts.get(best, 0)
        if cnt != -neg:
            continue  # stale
        if cnt < 2:
            break
        # deterministic tie-break: among equal counts pick the
        # lexicographically smallest pair (heap orders (-c, pair))
        merges.append(best)
        a, b = best
        merged = a + b
        affected = list(pair_words.pop(best, ()))
        pair_counts.pop(best, None)
        for wi in affected:
            syms = words[wi]
            f = freqs[wi]
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    if i > 0:
                        bump((syms[i - 1], a), -f, wi)
                        bump((syms[i - 1], merged), f, wi)
                    if i + 2 < len(syms):
                        nxt = syms[i + 2]
                        # the (b, nxt) pair disappears unless nxt
                        # starts another (a, b) occurrence whose own
                        # loop turn handles it
                        bump((b, nxt), -f, wi)
                    syms[i:i + 2] = [merged]
                    if i + 1 < len(syms):
                        bump((merged, syms[i + 1]), f, wi)
                else:
                    i += 1
    return merges


def synthetic_lattice(n: int) -> list[tuple[str, str]]:
    """Deterministic structurally-valid merge list over the lowercase
    alphabet: all 2-letter pairs, then (2-letter result, letter) and
    (letter, 2-letter result) 3-letter merges, then (2,2) 4-letter
    merges — each line merges two previously-constructible symbols."""
    letters = string.ascii_lowercase
    out: list[tuple[str, str]] = []
    two = []
    for a in letters:
        for b in letters:
            out.append((a, b))
            two.append(a + b)
            if len(out) >= n:
                return out
    for ab in two:
        for c in letters:
            out.append((ab, c))
            if len(out) >= n:
                return out
    for ab in two:
        for cd in two:
            out.append((ab, cd))
            if len(out) >= n:
                return out
    raise ValueError(f"lattice exhausted below n={n}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--byte-level", action="store_true")
    ap.add_argument("--fill-synthetic", action="store_true")
    args = ap.parse_args()

    wf = word_frequencies(args.input, args.text_col)
    if args.byte_level:
        from curw_flo2d_data_manager_spark.operators.bpe import (
            byte_pretokenize,
        )

        wf = Counter({byte_pretokenize(w): f for w, f in wf.items()})
    merges = learn_bpe(dict(wf), args.n)
    trained = len(merges)
    if len(merges) < args.n and args.fill_synthetic:
        have = {a + b for a, b in merges}
        for pair in synthetic_lattice(args.n * 2):
            if len(merges) >= args.n:
                break
            if pair[0] + pair[1] not in have:
                merges.append(pair)
                have.add(pair[0] + pair[1])
    with open(args.out, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        # the learned/filler split is recorded IN the artifact so a
        # reader can tell a genuinely-trained table from a padded one
        fh.write(f"#learned: {trained}\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    print(
        f"train_bpe_merges: {trained} trained + "
        f"{len(merges) - trained} synthetic = {len(merges)} merges "
        f"({len(wf)} distinct words) -> {args.out}"
    )


if __name__ == "__main__":
    main()
