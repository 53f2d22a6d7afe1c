"""Regenerate tests/fixtures/arxiv.zip — a miniature graph in the exact
official OGB node-prop zip layout (arxiv flavor: split scheme ``time``):

    arxiv/raw/edge.csv.gz          directed src,dst pairs
    arxiv/raw/node-feat.csv.gz     N x F floats
    arxiv/raw/node-label.csv.gz    N x 1 ints
    arxiv/split/time/{train,valid,test}.csv.gz

Deterministic; run ``python tests/fixtures/make_ogb_fixture.py`` from the
repo root only when the fixture needs to change.
"""

from __future__ import annotations

import gzip
import io
import os
import zipfile

import numpy as np

N, F, C = 10, 4, 3
EDGES = [  # directed, as the official files ship them
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
    (5, 6), (6, 7), (7, 8), (8, 9), (9, 5),
    (0, 5), (2, 7),
]
SPLIT = {"train": [0, 1, 2, 3, 4, 5], "valid": [6, 7], "test": [8, 9]}


def _csv_gz(rows) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        for row in rows:
            gz.write((",".join(str(v) for v in row) + "\n").encode())
    return buf.getvalue()


def main() -> None:
    rng = np.random.default_rng(0)
    x = np.round(rng.standard_normal((N, F)), 4)
    y = rng.integers(0, C, N)
    out = os.path.join(os.path.dirname(__file__), "arxiv.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("arxiv/raw/edge.csv.gz", _csv_gz(EDGES))
        zf.writestr("arxiv/raw/node-feat.csv.gz", _csv_gz(x.tolist()))
        zf.writestr(
            "arxiv/raw/node-label.csv.gz", _csv_gz([[v] for v in y])
        )
        for part, idx in SPLIT.items():
            zf.writestr(
                f"arxiv/split/time/{part}.csv.gz",
                _csv_gz([[v] for v in idx]),
            )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
