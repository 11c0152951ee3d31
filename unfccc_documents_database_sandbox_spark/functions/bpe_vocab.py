"""Pretrained byte-BPE vocabulary loading (VERDICT r13 #5).

The engine's byte-level BPE (plans/training.py) TRAINS its own merges;
real data pipelines count tokens under a PUBLISHED vocabulary — the
reference pins tiktoken (requirements.txt:67), whose GPT-2 lineage
ships merge lists in the `merges.txt` format: a `#version` header line
followed by one merge per line, the two sides written in the GPT-2
byte-to-unicode remapped alphabet (space = 'Ġ', newline = 'Ċ', ...).

`load_merges` parses that format into the engine's internal hex-pair
symbol alphabet ('\\x01HH\\x02' per UTF-8 byte), so a loaded published
vocab feeds the EXACT same JVM-side apply path
(`plans.training._bpe_apply` — chained literal replaces, one scan, no
Python in the loop) as a freshly-trained one.

`encode_reference` is a deliberately slow pure-Python GPT-2-style
encoder (rank-priority pair merging — the algorithm from OpenAI's
published encoder.py) used by the property suite to pin that the
distributed sequential-replace application produces identical
tokenizations: for a well-formed BPE merge list, applying merges
exhaustively in rank order equals priority-queue merging, because a
rank-k token can only assemble from tokens of rank < k, all of which
are already fully merged when rank k applies.

A small GPT-2-FORMAT fixture ships next to this module
(`gpt2_mini_merges.txt`, 20 common-English merges hand-assembled in the
remapped alphabet, each side derivable from earlier ranks — the format
and alphabet are GPT-2's; the list itself is original fixture data, not
a redistribution of the OpenAI vocabulary).
"""

from __future__ import annotations

import os

MINI_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "gpt2_mini_merges.txt"
)


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's published byte<->unicode table: the 188 'printable'
    latin-1 bytes map to themselves; the rest shift to 256+n so every
    byte has a visible, non-whitespace spelling (space -> 'Ġ' = 0x120).
    This is the public algorithm from OpenAI's gpt-2 encoder.py."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _token_to_hex(tok: str, uni2byte: dict[str, int], where: str) -> str:
    """A merges.txt token (remapped alphabet) -> the engine's uppercase
    hex-pair spelling of its raw bytes."""
    try:
        return "".join(f"{uni2byte[ch]:02X}" for ch in tok)
    except KeyError as e:
        raise ValueError(
            f"{where}: character {e.args[0]!r} in token {tok!r} is not "
            "in the GPT-2 byte alphabet — not a merges.txt file?"
        ) from None


def load_merges(path: str) -> list[tuple[str, str, int]]:
    """Parse a GPT-2-format merges file into the byte-BPE apply path's
    [(x_hex, y_hex, rank)] list, rank order preserved. Blank lines and
    the '#version' header are skipped; a line without exactly two
    space-separated tokens refuses (no guessing on a vocab file).

    Only the FIRST line is header-eligible, and only when it starts with
    '#version' — the GPT-2/HuggingFace loader rule. Published vocabularies
    contain genuine merges whose left token is '#' (e.g. '# #' forming
    '##'); treating every '#'-prefixed line as a comment would silently
    drop them and shift all later ranks (r14 ADVICE)."""
    uni2byte = {c: b for b, c in bytes_to_unicode().items()}
    merges: list[tuple[str, str, int]] = []
    with open(path, encoding="utf-8") as fh:
        for lineno, line in enumerate(fh, 1):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if lineno == 1 and line.startswith("#version"):
                continue
            parts = line.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"{path}:{lineno}: expected 'left right', got "
                    f"{line!r}")
            where = f"{path}:{lineno}"
            merges.append(
                (_token_to_hex(parts[0], uni2byte, where),
                 _token_to_hex(parts[1], uni2byte, where),
                 len(merges) + 1)
            )
    if not merges:
        raise ValueError(f"{path}: no merges found")
    return merges


def encode_reference(word: str, merges: list[tuple[str, str, int]]
                     ) -> list[str]:
    """Pure-Python rank-priority BPE over one pretoken (GPT-2
    encoder.py's algorithm), on the hex-pair alphabet: start from the
    word's UTF-8 bytes as symbols, repeatedly merge the PRESENT pair
    with the lowest rank until none applies. Returns the hex-symbol
    list — the reference the distributed apply path is property-tested
    against."""
    ranks = {(x, y): r for x, y, r in merges}
    syms = [f"{b:02X}" for b in word.encode("utf-8")]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL occurrences of the chosen pair left-to-right
        x, y = syms[best], syms[best + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
