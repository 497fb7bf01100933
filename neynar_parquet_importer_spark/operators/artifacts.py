"""Trained-artifact persistence: the save/load loop the index builders
promise ("trained once per corpus ... in production they'd be a
persisted artifact" — similarity.ivf_centroids, pca module doc).

An artifact here is a SMALL deterministic model derived from a corpus —
IVF centroids, PQ codebooks, a PCA basis, a BPE merge table, LSH
hyperplanes — that executors receive as literals. The store is a single
JSON file per artifact: human-auditable, diff-able, and EXACT — Python
round-trips every finite double bit-for-bit through repr/float (so a
reloaded basis projects to the same values, a reloaded centroid table
assigns the same cells, and the value-parity twins keep passing against
a model that went through disk).

Deliberately NOT parquet/pickle: parquet adds a Spark job for KB-sized
payloads and pickle is neither auditable nor cross-version-stable. The
envelope carries ``kind`` and a payload checksum so a path mix-up
(loading a PQ codebook where a PCA basis is expected, or a truncated
upload) fails loudly at load time, the `_sink_meta.json` discipline.
"""

from __future__ import annotations

import hashlib
import json
import os


def _checksum(payload) -> str:
    """md5 over a canonical JSON encoding (sorted keys, repr-exact
    floats — json.dumps uses repr, which is injective on finite
    doubles)."""
    blob = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    return hashlib.md5(blob.encode()).hexdigest()


def save_artifact(path: str, kind: str, payload: dict) -> None:
    """Write ``{kind, checksum, payload}`` atomically (tmp + rename —
    a reader never observes a half-written model)."""
    doc = {"kind": kind, "checksum": _checksum(payload), "payload": payload}
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, path)


def load_artifact(path: str, expected_kind: str) -> dict:
    """Load and verify: wrong ``kind`` or a corrupted payload raises
    instead of silently serving a wrong model."""
    with open(path) as f:
        doc = json.load(f)
    kind = doc.get("kind")
    if kind != expected_kind:
        raise ValueError(
            f"artifact at {path!r} is kind {kind!r}, expected"
            f" {expected_kind!r}"
        )
    payload = doc.get("payload")
    if _checksum(payload) != doc.get("checksum"):
        raise ValueError(f"artifact at {path!r} failed its checksum")
    return payload


# thin typed wrappers: one place that states each model's payload shape

def save_pca(path: str, mean, comps, eigs, evr) -> None:
    save_artifact(
        path, "pca",
        {"mean": mean, "components": comps, "eigenvalues": eigs, "evr": evr},
    )


def load_pca(path: str):
    p = load_artifact(path, "pca")
    return p["mean"], p["components"], p["eigenvalues"], p["evr"]


def save_ivf(path: str, centroids) -> None:
    save_artifact(path, "ivf", {"centroids": centroids})


def load_ivf(path: str):
    return load_artifact(path, "ivf")["centroids"]


def save_bpe(path: str, merges) -> None:
    save_artifact(
        path, "bpe", {"merges": [[a, b, c] for a, b, c in merges]}
    )


def load_bpe(path: str):
    return [
        (a, b, c) for a, b, c in load_artifact(path, "bpe")["merges"]
    ]


def save_pq(path: str, codebooks) -> None:
    save_artifact(path, "pq", {"codebooks": codebooks})


def load_pq(path: str):
    return load_artifact(path, "pq")["codebooks"]
