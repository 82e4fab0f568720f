"""Visual place recognition database + semantic (floor-gated) retrieval.

TPU-native re-design of the reference VPR layer
(scripts/semantic_gating/place_recognition.py):
  * descriptors live in one device-resident (N, D) matrix, not a Python
    list crawled per query;
  * batch extraction replaces the one-image-at-a-time loop (:972-986);
  * `find_loop_closures` is a single tiled GEMM + fused masking + on-chip
    top-k (ops/knn.py) instead of an N x N numpy matrix walked per row
    (:851-911);
  * decision semantics preserved exactly: self/temporal mask
    |dt| < min_time_gap, top-k (k=10), similarity threshold 0.5, per-match
    floor-consistency validity flag, and the same match statistics
    (:913-933).

Encoders are pluggable: any object with
`encode_batch(images: (B, H, W, 3) uint8) -> (B, D)` works; the model
classes in mlis_tpu.models (MixVPR / SALAD / AnyLoc / CricaVPR) implement
this interface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from mlis_tpu.ops.knn import cosine_topk, pairwise_similarity

import jax.numpy as jnp


@dataclass
class PlaceMatch:
    """A retrieval match (field parity with reference :61-69)."""

    query_idx: int
    match_idx: int
    similarity: float
    query_timestamp: Optional[float] = None
    match_timestamp: Optional[float] = None
    is_valid: bool = True


@dataclass
class PlaceDescriptor:
    """One database entry (field parity with reference :72-78)."""

    timestamp: float
    descriptor: np.ndarray
    image_path: Optional[str] = None
    floor_label: Optional[int] = None


class BasePlaceRecognition:
    """Descriptor database with cosine retrieval."""

    def __init__(self, descriptor_dim: int = 4096, encoder=None):
        self.descriptor_dim = descriptor_dim
        self.encoder = encoder
        self.descriptors: List[PlaceDescriptor] = []
        self._matrix_cache: Optional[np.ndarray] = None

    # -- extraction ----------------------------------------------------------
    def extract_descriptor(self, image: np.ndarray) -> np.ndarray:
        return self.extract_descriptors(image[None])[0]

    def extract_descriptors(self, images: np.ndarray) -> np.ndarray:
        """Batched descriptor extraction — the TPU-native hot path."""
        if self.encoder is None:
            raise NotImplementedError("no encoder attached")
        return np.asarray(self.encoder.encode_batch(images))

    # -- database ------------------------------------------------------------
    def add_image(
        self,
        image: np.ndarray,
        timestamp: float,
        floor_label: Optional[int] = None,
        image_path: Optional[str] = None,
    ) -> PlaceDescriptor:
        d = self.extract_descriptor(image)
        return self.add_descriptor(d, timestamp, floor_label, image_path)

    def add_images_batch(
        self,
        images: np.ndarray,
        timestamps: Sequence[float],
        floor_labels: Optional[Sequence[int]] = None,
        image_paths: Optional[Sequence[str]] = None,
    ) -> List[PlaceDescriptor]:
        descs = self.extract_descriptors(images)
        out = []
        for i, d in enumerate(descs):
            out.append(
                self.add_descriptor(
                    d,
                    float(timestamps[i]),
                    None if floor_labels is None else int(floor_labels[i]),
                    None if image_paths is None else image_paths[i],
                )
            )
        return out

    def add_descriptor(
        self,
        descriptor: np.ndarray,
        timestamp: float,
        floor_label: Optional[int] = None,
        image_path: Optional[str] = None,
    ) -> PlaceDescriptor:
        pd = PlaceDescriptor(
            timestamp=timestamp,
            descriptor=np.asarray(descriptor),
            image_path=image_path,
            floor_label=floor_label,
        )
        self.descriptors.append(pd)
        self._matrix_cache = None
        return pd

    def build_descriptor_matrix(self) -> np.ndarray:
        if not self.descriptors:
            return np.array([])
        if self._matrix_cache is None or len(self._matrix_cache) != len(
            self.descriptors
        ):
            self._matrix_cache = np.vstack(
                [d.descriptor for d in self.descriptors]
            ).astype(np.float32)
        return self._matrix_cache

    def timestamps(self) -> np.ndarray:
        return np.asarray([d.timestamp for d in self.descriptors])

    def floor_labels(self) -> np.ndarray:
        return np.asarray(
            [
                -(10**9) if d.floor_label is None else d.floor_label
                for d in self.descriptors
            ]
        )

    # -- retrieval -------------------------------------------------------------
    def query(
        self,
        image: np.ndarray,
        timestamp: Optional[float] = None,
        k: int = 5,
        min_time_gap: float = 10.0,
    ) -> List[PlaceMatch]:
        if not self.descriptors:
            return []
        q = self.extract_descriptor(image)[None]
        db = self.build_descriptor_matrix()
        qt = (
            np.asarray([timestamp]) if timestamp is not None else None
        )
        scores, idx = cosine_topk(
            jnp.asarray(q),
            jnp.asarray(db),
            None if qt is None else jnp.asarray(qt),
            None if qt is None else jnp.asarray(self.timestamps()),
            k=min(k, len(self.descriptors)),
            min_time_gap=min_time_gap,
        )
        scores = np.asarray(scores)[0]
        idx = np.asarray(idx)[0]
        matches = []
        for s, j in zip(scores, idx):
            if not np.isfinite(s):
                continue
            matches.append(
                PlaceMatch(
                    query_idx=len(self.descriptors),
                    match_idx=int(j),
                    similarity=float(s),
                    query_timestamp=timestamp,
                    match_timestamp=self.descriptors[int(j)].timestamp,
                )
            )
        return matches

    def compute_all_pairwise_similarities(self) -> np.ndarray:
        m = self.build_descriptor_matrix()
        if len(m) == 0:
            return np.array([])
        return np.asarray(pairwise_similarity(jnp.asarray(m)))

    # -- persistence (SURVEY §5: descriptor-database checkpointing) -----------
    def save_database(self, path) -> None:
        """Persist the descriptor DB (descriptors + timestamps + floors +
        paths) as one npz — resume retrieval without re-encoding."""
        from pathlib import Path as _P

        m = self.build_descriptor_matrix()
        np.savez_compressed(
            _P(path),
            descriptors=m if len(m) else np.zeros((0, self.descriptor_dim)),
            timestamps=self.timestamps(),
            floors=self.floor_labels(),
            paths=np.asarray(
                [d.image_path or "" for d in self.descriptors], dtype=object
            ),
        )

    def load_database(self, path) -> int:
        data = np.load(path, allow_pickle=True)
        self.descriptors = []
        self._matrix_cache = None
        floors = data["floors"]
        paths = data["paths"]
        for i, (d, t) in enumerate(zip(data["descriptors"], data["timestamps"])):
            self.add_descriptor(
                d,
                float(t),
                None if floors[i] <= -(10**9) else int(floors[i]),
                str(paths[i]) or None,
            )
        return len(self.descriptors)


class SemanticPlaceRecognition:
    """Floor-gated VPR (reference :806-933 semantics)."""

    def __init__(
        self,
        vpr_method: Union[str, BasePlaceRecognition] = "mixvpr",
        similarity_threshold: float = 0.5,
        min_time_gap: float = 10.0,
        **encoder_kwargs,
    ):
        self.similarity_threshold = similarity_threshold
        self.min_time_gap = min_time_gap
        if isinstance(vpr_method, BasePlaceRecognition):
            self.vpr = vpr_method
        else:
            self.vpr = _build_vpr(vpr_method.lower(), **encoder_kwargs)

    def add_image(
        self,
        image: np.ndarray,
        timestamp: float,
        floor_label: int,
        image_path: Optional[str] = None,
    ) -> PlaceDescriptor:
        return self.vpr.add_image(image, timestamp, floor_label, image_path)

    def add_images_batch(self, images, timestamps, floor_labels, image_paths=None):
        return self.vpr.add_images_batch(images, timestamps, floor_labels, image_paths)

    def find_loop_closures(
        self, enable_floor_gating: bool = True, k: int = 10, rerank: bool = True
    ) -> List[PlaceMatch]:
        """Retrieval + floor gating; when the encoder exposes patch-feature
        reranking (CricaVPR), each query's candidates are re-scored with the
        cross-correlation mix before thresholding (reference :714-757)."""
        n = len(self.vpr.descriptors)
        if n < 2:
            return []
        db = jnp.asarray(self.vpr.build_descriptor_matrix())
        times = jnp.asarray(self.vpr.timestamps())
        scores, idx = cosine_topk(
            db, db, times, times, k=min(k, n), min_time_gap=self.min_time_gap
        )
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        floors = self.vpr.floor_labels()
        ts = self.vpr.timestamps()
        use_rerank = (
            rerank
            and hasattr(self.vpr, "rerank_scores_all")
            and getattr(self.vpr, "use_reranking", False)
            # a DB populated from precomputed descriptors (add_descriptor,
            # no images) has no patch features to correlate — degrade to
            # un-reranked retrieval like the per-query path used to
            and len(getattr(self.vpr, "patch_cache", ())) >= n
        )

        if use_rerank:
            # ALL queries' patch-correlation reranks in one device program
            # (the per-query path is 1 dispatch/query — prohibitive through
            # the tunnel at SURVEY's 19k-keyframe scale)
            cc = self.vpr.rerank_scores_all(
                np.arange(n, dtype=np.int32), np.clip(idx, 0, n - 1)
            )
            w = self.vpr.rerank_weight
            finite = np.isfinite(scores)
            mixed = np.where(finite, (1 - w) * scores + w * cc, -np.inf)
            # re-sort candidates per query by mixed score (reference :714-757)
            order = np.argsort(-mixed, axis=1, kind="stable")
            scores = np.take_along_axis(mixed, order, axis=1)
            idx = np.take_along_axis(idx, order, axis=1)

        # vectorized match construction (row-major nonzero preserves the
        # reference's per-query, descending-similarity order; a Python
        # n x k loop is ~19k x 10 iterations at SURVEY §6 scale)
        keep = np.isfinite(scores) & (scores >= self.similarity_threshold)
        qi, kk = np.nonzero(keep)
        mj = idx[qi, kk]
        sim = scores[qi, kk]
        valid = np.ones(len(qi), dtype=bool)
        if enable_floor_gating:
            qf = floors[qi]
            mf = floors[mj]
            known = (qf > -(10**9)) & (mf > -(10**9))
            valid = np.where(known, qf == mf, True)
        return [
            PlaceMatch(
                query_idx=int(qi[p]),
                match_idx=int(mj[p]),
                similarity=float(sim[p]),
                query_timestamp=float(ts[qi[p]]),
                match_timestamp=float(ts[mj[p]]),
                is_valid=bool(valid[p]),
            )
            for p in range(len(qi))
        ]

    def get_statistics(self, matches: List[PlaceMatch]) -> Dict:
        if not matches:
            return {
                "total_matches": 0,
                "valid_matches": 0,
                "rejected_matches": 0,
                "rejection_rate": 0.0,
            }
        valid = sum(1 for m in matches if m.is_valid)
        rejected = len(matches) - valid
        return {
            "total_matches": len(matches),
            "valid_matches": valid,
            "rejected_matches": rejected,
            "rejection_rate": rejected / len(matches),
            "mean_similarity": float(np.mean([m.similarity for m in matches])),
            "mean_valid_similarity": float(
                np.mean([m.similarity for m in matches if m.is_valid])
            )
            if valid
            else 0.0,
        }


def _build_vpr(method: str, **kwargs) -> BasePlaceRecognition:
    if method == "mixvpr":
        from mlis_tpu.models.mixvpr import MixVPR

        return MixVPR(**kwargs)
    if method == "salad":
        from mlis_tpu.models.salad import SALAD

        return SALAD(**kwargs)
    if method == "anyloc":
        from mlis_tpu.models.anyloc import AnyLoc

        return AnyLoc(**kwargs)
    if method == "cricavpr":
        from mlis_tpu.models.cricavpr import CricaVPR

        return CricaVPR(**kwargs)
    raise ValueError(
        f"Unknown VPR method: {method}. Available: mixvpr, salad, anyloc, cricavpr"
    )


def process_image_sequence(
    images: Union[np.ndarray, Sequence[np.ndarray]],
    timestamps: np.ndarray,
    floor_labels: np.ndarray,
    vpr_method: str = "mixvpr",
    batch_size: int = 32,
    **encoder_kwargs,
) -> Tuple[SemanticPlaceRecognition, List[PlaceMatch]]:
    """Batched sequence driver (replaces the reference's per-image loop,
    :936-991)."""
    spr = SemanticPlaceRecognition(vpr_method=vpr_method, **encoder_kwargs)
    n = min(len(images), len(timestamps), len(floor_labels))
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        batch = np.stack([np.asarray(images[i]) for i in range(s, e)])
        spr.add_images_batch(batch, timestamps[s:e], floor_labels[s:e])
    matches = spr.find_loop_closures(enable_floor_gating=True)
    return spr, matches
