#!/usr/bin/env python
"""Export fastText word vectors to the npz archive `Vocab` consumes.

The reference fills `Vocab.word_embedding_weights` live from a fastText
`.bin` model (scripts/model/vocab.py:70-84, called via
scripts/utils/vocab_utils.py:12-22's `word_vec_path`).  This framework keeps
the fastText dependency out of the runtime: export once with this tool, then
point `Vocab.load_word_vectors_npz(path, dim)` (data/vocab.py:81) at the
archive.

Two input formats:
  *.bin  — binary fastText model; needs the `fasttext` package (not baked
           into this image — run the export wherever that package exists).
           Matches the reference path exactly, including subword vectors for
           out-of-vocabulary words.
  *.vec  — the plain-text format fastText ships next to every .bin
           (`<n> <dim>` header, then `word v1 .. vdim` lines); needs only
           numpy.  OOV words fall back to Vocab's seeded random init, which
           is the reference behaviour for words absent from the model's
           native vocabulary too.

Usage:
  python scripts/export_fasttext_npz.py crawl-300d-2M.vec out.npz \
      [--words words.txt] [--dim 300]

Without --words every vector in a .vec file is exported (the archive is a
{word: vector} dict, so the runtime lookup is unaffected by extras); with
--words (one word per line, e.g. a dumped Vocab word list or
beat_words.txt) only those words are exported, which keeps the archive
small.  .bin input requires --words, since subword models have no finite
word list to enumerate.
"""

import argparse
import os
import sys

import numpy as np


def load_words(path: str) -> list:
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def export_from_vec(vec_path: str, words, dim: int) -> dict:
    want = set(words) if words is not None else None
    out = {}
    with open(vec_path, encoding="utf-8", errors="replace") as f:
        header = f.readline().split()
        file_dim = int(header[1]) if len(header) == 2 else len(header) - 1
        if len(header) != 2:  # GloVe-style file without a header line
            f.seek(0)
        if file_dim != dim:
            raise SystemExit(
                f"--dim {dim} but {vec_path} carries {file_dim}-d vectors"
            )
        for line in f:
            parts = line.rstrip("\n").split(" ")
            word = parts[0]
            if want is not None and word not in want:
                continue
            vec = np.asarray(parts[1 : dim + 1], dtype=np.float32)
            if vec.shape[0] == dim:
                out[word] = vec
    return out


def export_from_bin(bin_path: str, words, dim: int) -> dict:
    try:
        import fasttext  # not in this image; available where .bin files are
    except ImportError:
        raise SystemExit(
            "the `fasttext` package is required for .bin input and is not "
            "installed here; export from the sibling .vec file instead, or "
            "run this script in an environment with fasttext"
        )
    model = fasttext.load_model(bin_path)
    if model.get_dimension() != dim:
        raise SystemExit(
            f"--dim {dim} but {bin_path} is {model.get_dimension()}-d"
        )
    # get_word_vector matches vocab.py:81 — subword composition gives a
    # vector for every requested word, OOV included.
    return {w: model.get_word_vector(w).astype(np.float32) for w in words}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", help="fastText .bin or .vec file")
    ap.add_argument("out", help="output .npz archive")
    ap.add_argument("--words", default="",
                    help="optional word list (one per line) to restrict the "
                         "export; required for .bin input")
    ap.add_argument("--dim", type=int, default=300,
                    help="vector dimension (reference uses 300, "
                         "vocab.py:70)")
    args = ap.parse_args()

    words = load_words(args.words) if args.words else None
    if args.model.endswith(".bin"):
        if words is None:
            ap.error(".bin input requires --words (subword models have no "
                     "finite vocabulary to enumerate)")
        table = export_from_bin(args.model, words, args.dim)
    else:
        table = export_from_vec(args.model, words, args.dim)

    if not table:
        raise SystemExit("no vectors exported — empty word list or no "
                         "overlap with the model file")
    np.savez_compressed(args.out, **table)
    print(
        f"wrote {len(table)} x {args.dim}-d vectors to {args.out} "
        f"({os.path.getsize(args.out) / 1e6:.1f} MB)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
