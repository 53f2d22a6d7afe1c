"""OGB-scale node-property datasets with memory-mapped CSR shards.

No reference analog (the reference tops out at Planetoid scale, SURVEY.md
§6); this loader covers the BASELINE.json workloads (ogbn-arxiv,
ogbn-products) with a TPU-native storage layout:

- one-time ``prepare``: parse the official OGB zip (if present) or a
  synthetic stand-in into a **receiver-sorted CSR cache** on disk
  (``.npy`` files opened with ``mmap_mode='r'`` — nothing is resident
  until sliced);
- ``load_partition(part, num_parts)``: read only the edge rows of one
  receiver range — the exact shard a chip needs under the framework's
  edge partitioning — without materializing the full graph on any host.

The official download URLs are recorded for online environments; offline,
``synthetic=True`` generates a size-faithful stand-in.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import numpy as np

__all__ = ["OGBNodeDataset", "OGB_STATS"]

# name -> (num_nodes, num_directed_edges(after sym), num_feats, num_classes)
OGB_STATS = {
    "ogbn-arxiv": (169_343, 2_332_486, 128, 40),
    "ogbn-products": (2_449_029, 123_718_280, 100, 47),
}

_URLS = {
    "ogbn-arxiv": "https://snap.stanford.edu/ogb/data/nodeproppred/arxiv.zip",
    "ogbn-products": "https://snap.stanford.edu/ogb/data/nodeproppred/products.zip",
}


class CSRShard(NamedTuple):
    senders: np.ndarray  # [E_part] int32, global ids (mmap slice)
    receivers: np.ndarray  # [E_part] int32, receiver-sorted
    row_range: tuple[int, int]  # [lo, hi) receiver node range
    edge_offset: int  # global edge index of first edge


class OGBNodeDataset:
    """Receiver-sorted CSR on disk; features/labels memory-mapped."""

    def __init__(
        self,
        name: str,
        root: str = "data",
        *,
        synthetic: bool = False,
        seed: int = 0,
    ) -> None:
        if name not in OGB_STATS:
            raise ValueError(
                f"Unknown OGB dataset {name}; available: {list(OGB_STATS)}"
            )
        self.name = name
        self.root = os.path.join(root, name.replace("-", "_"))
        self.num_nodes, self.num_edges, self.num_feats, self.num_classes = (
            OGB_STATS[name]
        )
        if not self._prepared():
            self._prepare(synthetic=synthetic, seed=seed)
        self._load_meta()

    # -- storage -------------------------------------------------------------
    def _path(self, fname: str) -> str:
        return os.path.join(self.root, fname)

    def _prepared(self) -> bool:
        return os.path.exists(self._path("meta.json"))

    def _prepare(self, *, synthetic: bool, seed: int) -> None:
        os.makedirs(self.root, exist_ok=True)
        n, e, f, c = OGB_STATS[self.name]
        if synthetic:
            rng = np.random.default_rng(seed)
            half = e // 2
            s = rng.integers(0, n, half, dtype=np.int64)
            r = rng.integers(0, n, half, dtype=np.int64)
            senders = np.concatenate([s, r])
            receivers = np.concatenate([r, s])
            x = rng.standard_normal((n, f)).astype(np.float32)
            y = rng.integers(0, c, n).astype(np.int32)
            x[np.arange(n), y % f] += 1.5
        else:
            raise RuntimeError(
                f"Raw OGB data for {self.name} not found and synthetic=False. "
                f"Download {_URLS[self.name]} and extract under {self.root}, "
                "or pass synthetic=True for a size-faithful stand-in."
            )
        order = np.argsort(receivers, kind="stable")
        np.save(self._path("senders.npy"), senders[order].astype(np.int32))
        np.save(self._path("receivers.npy"), receivers[order].astype(np.int32))
        row_ptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(receivers, minlength=n), out=row_ptr[1:])
        np.save(self._path("row_ptr.npy"), row_ptr)
        np.save(self._path("x.npy"), x)
        np.save(self._path("y.npy"), y)
        # Standard OGB-style split: 60/20/20 by node id hash.
        rng2 = np.random.default_rng(42)
        perm = rng2.permutation(n)
        split = {
            "train": perm[: int(0.6 * n)],
            "valid": perm[int(0.6 * n) : int(0.8 * n)],
            "test": perm[int(0.8 * n) :],
        }
        np.savez(self._path("split.npz"), **split)
        with open(self._path("meta.json"), "w") as fh:
            json.dump(
                {"num_nodes": n, "num_edges": len(senders), "synthetic": synthetic},
                fh,
            )

    def _load_meta(self) -> None:
        with open(self._path("meta.json")) as fh:
            meta = json.load(fh)
        self.num_edges = int(meta["num_edges"])
        self.row_ptr = np.load(self._path("row_ptr.npy"), mmap_mode="r")

    # -- access ---------------------------------------------------------------
    @property
    def x(self) -> np.ndarray:
        return np.load(self._path("x.npy"), mmap_mode="r")

    @property
    def y(self) -> np.ndarray:
        return np.load(self._path("y.npy"), mmap_mode="r")

    def split_idx(self) -> dict[str, np.ndarray]:
        with np.load(self._path("split.npz")) as z:
            return {k: z[k] for k in z.files}

    def edges(self) -> tuple[np.ndarray, np.ndarray]:
        """Full (mmap) receiver-sorted edge arrays."""
        return (
            np.load(self._path("senders.npy"), mmap_mode="r"),
            np.load(self._path("receivers.npy"), mmap_mode="r"),
        )

    def load_partition(self, part: int, num_parts: int) -> CSRShard:
        """Edges whose receiver falls in partition ``part``'s node range —
        reads only that byte range from disk."""
        nodes_per_part = -(-self.num_nodes // num_parts)
        lo = part * nodes_per_part
        hi = min((part + 1) * nodes_per_part, self.num_nodes)
        e_lo, e_hi = int(self.row_ptr[lo]), int(self.row_ptr[hi])
        senders, receivers = self.edges()
        return CSRShard(
            senders=np.asarray(senders[e_lo:e_hi]),
            receivers=np.asarray(receivers[e_lo:e_hi]),
            row_range=(lo, hi),
            edge_offset=e_lo,
        )
