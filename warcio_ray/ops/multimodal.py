"""Multimodal column stages: opaque binary payloads + typed metadata.

Two decode tiers behind every stage:

* ``fake=True`` (the oracle surface): deterministic pseudo-decodings
  derived from payload bytes / media ids in SQL-replayable closed
  forms, exercising the REAL Ray-side plumbing — schema, actor-pool
  signature, batch sizing for wide binary rows, output layout.
* ``fake=False`` (real bytes): stdlib decoders for UNCOMPRESSED
  containers — BI_RGB BMP and PCM WAV (``ops/mediacodec``, struct +
  numpy only) — feed the same vectorized kernels (dHash, VAD, patch
  stats, area resize). Compressed formats (JPEG/MP3/MP4) still need
  codec libraries absent in this sandbox: those raise
  ``NotImplementedError``/``ValueError``, never silently fake.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # 'image' | 'audio' | 'video'
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("mime", pa.string()),
])

FEATURE_DIM = 14  # 8 header bytes + 14*4 feature bytes = one blake2b-64


class MediaDecodeStage:
    """Actor-pool stage: decode + feature-extract binary media.

    ``fake=True`` (default) derives deterministic pseudo-decodings
    from the payload bytes; ``fake=False`` really decodes BI_RGB BMP
    (kind='image') / PCM WAV (kind='audio') payloads via
    ``ops/mediacodec`` and raises on anything compressed.
    """

    def __init__(self, kind: str = "image", fake: bool = True,
                 target_size: int = 64, hash_algo: str = "blake2b"):
        self.kind = kind
        self.fake = fake
        self.target_size = target_size
        self.hash_algo = hash_algo
        if not fake and kind not in ("image", "audio"):
            raise NotImplementedError(
                "real decoding exists for uncompressed containers only "
                "(kind='image' BMP, kind='audio' PCM WAV); other kinds "
                "need codec libraries absent here — run with fake=True")

    # -- kernels ----------------------------------------------------------
    def _decode_fake(self, payload: bytes):
        """Deterministic stand-in: dimensions + feature vector derived
        from a hash stream over the payload. ``hash_algo='md5'`` uses the
        md5 hexdigest for width/height so the derivation is expressible
        in DuckDB SQL (the media_features oracle)."""
        if self.hash_algo == "md5":
            hx = hashlib.md5(payload or b"").hexdigest()
            width = 1 + int(hx[0:8], 16) % 4096
            height = 1 + int(hx[8:16], 16) % 4096
            raw = hashlib.blake2b(payload or b"",
                                  digest_size=FEATURE_DIM * 4).digest()
            feats = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)
            return width, height, feats / np.float32(2 ** 32)
        h = hashlib.blake2b(payload or b"", digest_size=8 + FEATURE_DIM * 4)
        raw = h.digest()
        width = 1 + int.from_bytes(raw[0:4], "big") % 4096
        height = 1 + int.from_bytes(raw[4:8], "big") % 4096
        feats = np.frombuffer(raw[8:], dtype=np.uint32).astype(np.float32)
        feats = feats / np.float32(2 ** 32)
        return width, height, feats

    def _decode_real(self, payload: bytes):
        """Real decode for uncompressed containers (stdlib struct —
        ops/mediacodec): BMP for images, PCM WAV for audio. Features:
        image -> FEATURE_DIM integer block-mean lumas of the gray
        image, /255; audio -> FEATURE_DIM block-mean |sample|
        energies, /32768; width/height -> (W, H) for images,
        (n_samples, sample_rate) for audio."""
        from warcio_ray.ops.mediacodec import (
            block_mean_resize,
            decode_wav,
            gray_from_bmp,
        )

        if self.kind == "image":
            gray = gray_from_bmp(payload or b"")
            h, w = gray.shape
            feats = block_mean_resize(gray, 1, FEATURE_DIM)[0] \
                .astype(np.float32) / np.float32(255)
            return w, h, feats
        if self.kind == "audio":
            rate, mono = decode_wav(payload or b"")
            if len(mono) == 0:
                return 0, rate, np.zeros(FEATURE_DIM, dtype=np.float32)
            feats = block_mean_resize(np.abs(mono)[None, :], 1,
                                      FEATURE_DIM)[0] \
                .astype(np.float32) / np.float32(32768)
            return len(mono), rate, feats
        raise NotImplementedError(
            f"no real decoder for kind={self.kind!r}")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        widths, heights, feats = [], [], []
        for payload in batch["payload"]:
            w, h, f = (self._decode_fake(payload) if self.fake
                       else self._decode_real(payload))
            widths.append(w)
            heights.append(h)
            feats.append(f)
        return pd.DataFrame({
            "media_id": batch["media_id"].astype("int64"),
            "kind": batch["kind"],
            "width": np.array(widths, dtype=np.int32),
            "height": np.array(heights, dtype=np.int32),
            "features": feats,
        })


def decode_media(ds, kind: str = "image", fake: bool = True,
                 concurrency: int = 2, batch_size: int = 64,
                 hash_algo: str = "blake2b"):
    """Media dataset -> decoded metadata + features.

    batch_size is deliberately small: payload cells are wide binaries, so
    batch x concurrency must fit the worker heap (ray_guide memory note).
    """
    return ds.map_batches(MediaDecodeStage, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"kind": kind, "fake": fake,
                                                 "hash_algo": hash_algo})


def media_from_documents(sf_dir: str):
    """Media table derived straight from documents (payload = utf-8 text
    bytes, media_id = doc_id): every derivation is SQL-mirrorable, which
    makes the decode stage hard-oracle checkable while exercising the
    same wide-binary actor-pool plumbing."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        n = len(batch)
        payloads = [(t or "").encode("utf-8")
                    for t in batch["text"].to_pylist()]
        return pa.table({
            "media_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
        })

    return ds.map_batches(to_media, batch_format="pyarrow")


def media_from_pages(sf_dir: str):
    """Synthesize a media table from pages html payloads (binary
    stand-ins), exercising the real plumbing end-to-end."""
    import pyarrow.compute as pc
    import ray.data

    from warcio_ray.pages import build_pages

    ds = ray.data.read_parquet(build_pages(sf_dir), columns=["url", "html"])

    def to_media(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = pc.cast(pc.binary_length(batch["html"]), pa.int64())
        # media_id = stable per-row id derived from the url hash
        import hashlib as _h
        mids = [int.from_bytes(_h.blake2b(u.encode(), digest_size=7).digest(),
                               "big") for u in batch["url"].to_pylist()]
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pc.cast(batch["html"], pa.large_binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
        })

    return ds.map_batches(to_media, batch_format="pyarrow")


class MediaResizeStage:
    """Actor-pool resize stage (image -> target_size x target_size).

    ``fake=False`` really resizes BMP payloads: grayscale integer
    area-resize re-encoded as an 8-bit gray BMP (ops/mediacodec,
    stdlib only). The fake kernel derives a deterministic resized
    payload (blake2b stream of the source bytes + target dims) so the
    Ray plumbing — wide binary in, wide binary out, bounded batches —
    is exercised either way."""

    def __init__(self, target_size: int = 64, fake: bool = True):
        self.target_size = target_size
        self.fake = fake

    def _resize_fake(self, payload: bytes) -> bytes:
        n = self.target_size * self.target_size
        h = hashlib.blake2b(payload or b"", digest_size=32,
                            person=b"resize").digest()
        reps = (n + len(h) - 1) // len(h)
        return (h * reps)[:n]

    def _resize_real(self, payload: bytes) -> bytes:
        """BMP -> grayscale integer area-resize -> 8-bit gray BMP
        (stdlib only; ops/mediacodec)."""
        from warcio_ray.ops.mediacodec import (
            block_mean_resize,
            encode_bmp_gray8,
            gray_from_bmp,
        )

        small = block_mean_resize(gray_from_bmp(payload or b""),
                                  self.target_size, self.target_size)
        return encode_bmp_gray8(small.astype(np.uint8))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        kernel = self._resize_fake if self.fake else self._resize_real
        out = [kernel(p) for p in batch["payload"]]
        return pd.DataFrame({
            "media_id": batch["media_id"].astype("int64"),
            "kind": batch["kind"],
            "payload": out,
            "width": np.full(len(batch), self.target_size, dtype=np.int32),
            "height": np.full(len(batch), self.target_size, dtype=np.int32),
        })


class FrameSampleStage:
    """Actor-pool video frame sampler: emits n_frames rows per input
    (flat-map shape inside map_batches), frame offsets chosen
    deterministically from the payload hash — the real layout a video
    pipeline needs (one row per sampled frame, frame_idx column), with
    the codec stubbed."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "real frame decode requires av/ffmpeg, not present in "
                "this environment — run with fake=True")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, frames = [], [], []
        for media_id, payload in zip(batch["media_id"], batch["payload"]):
            payload = payload or b""  # null binary cells are expected
            h = hashlib.blake2b(payload, digest_size=8,
                                person=b"frames").digest()
            dur = 1 + int.from_bytes(h[:4], "big") % 10_000  # fake frames
            for j in range(self.n_frames):
                ids.append(int(media_id))
                idxs.append((dur * (j + 1)) // (self.n_frames + 1))
                frames.append(hashlib.blake2b(
                    payload + j.to_bytes(2, "big"), digest_size=16,
                    person=b"frame").digest())
        return pd.DataFrame({"media_id": np.array(ids, dtype="int64"),
                             "frame_idx": np.array(idxs, dtype="int64"),
                             "frame": frames})


def resize_media(ds, target_size: int = 64, concurrency: int = 2,
                 batch_size: int = 64):
    return ds.map_batches(MediaResizeStage, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"target_size": target_size})


def sample_frames(ds, n_frames: int = 4, concurrency: int = 2,
                  batch_size: int = 64):
    return ds.map_batches(FrameSampleStage, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"n_frames": n_frames})


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection (image dedup)
# ---------------------------------------------------------------------------

class MediaPhashStage:
    """Actor-pool stage: 64-bit perceptual hash per media row — the
    image-dedup signature (real kernel: decode -> 9x8 grayscale ->
    dHash).  ``fake=True`` derives the hash from the payload's md5
    (SQL-expressible, exercising identical plumbing); ``fake=False``
    raises until a codec library exists, like MediaDecodeStage."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    @staticmethod
    def _dhash_real(payload: bytes) -> int:
        """The textbook dHash on real pixels: BMP -> grayscale ->
        integer area-resize to 9 wide x 8 tall -> 64 left<right bits,
        row-major MSB-first."""
        from warcio_ray.ops.mediacodec import (
            block_mean_resize,
            gray_from_bmp,
        )

        g = block_mean_resize(gray_from_bmp(payload or b""), 8, 9)
        bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
        out = 0
        for b in bits:
            out = (out << 1) | int(b)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.fake:
            hashes = np.fromiter(
                (int(hashlib.md5(p or b"").hexdigest()[:16], 16)
                 for p in batch["payload"]),
                dtype=np.uint64, count=len(batch))
        else:
            hashes = np.fromiter(
                (self._dhash_real(p) for p in batch["payload"]),
                dtype=np.uint64, count=len(batch))
        return pd.DataFrame({
            "media_id": batch["media_id"].astype("int64"),
            "phash": hashes})


def phash_neardups(sig_ds, max_hamming: int = 3,
                   max_bucket: int = 512) -> pd.DataFrame:
    """(media_id, phash uint64) -> sorted near-duplicate pairs (a, b)
    with Hamming(phash_a, phash_b) <= ``max_hamming`` — image dedup
    over perceptual hashes, REUSING the simhash machinery wholesale
    (4x16 band melt -> ONE hash shuffle of capped bucket partitions ->
    distributed pair dedup -> vectorized Hamming verify): by pigeonhole
    any pair within Hamming 3 shares at least one untouched 16-bit
    band, so banding loses nothing.  Scale shape identical to
    simhash_dedup; drop accounting in ``attrs['lsh_dropped_ids']``."""
    from warcio_ray.ops.dedup import (_dedup_pairs, candidate_pairs,
                                      hamming64, melt_simhash_bands)

    def to_sig(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["media_id"].astype("int64"),
            "simhash": batch["phash"].to_numpy(dtype=np.uint64)})

    melted = sig_ds.map_batches(to_sig, batch_format="pandas") \
        .map_batches(melt_simhash_bands, batch_format="pandas")
    raw_pairs = candidate_pairs(melted, ["band_id", "band_key"],
                                max_bucket, value_col="simhash")
    deduped, n_dropped = _dedup_pairs(raw_pairs,
                                      extra_cols=("val_a", "val_b"))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch[["a", "b"]]
        keep = hamming64(batch["val_a"].to_numpy(dtype=np.uint64),
                         batch["val_b"].to_numpy(dtype=np.uint64)) \
            <= max_hamming
        return batch[keep][["a", "b"]]

    out = deduped.map_batches(verify, batch_format="pandas").to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True) if len(out) \
        else pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64")})
    out.attrs["lsh_dropped_ids"] = n_dropped
    return out


class AudioVadStage:
    """Actor-pool stage: voice-activity segmentation over an audio
    payload — frame RMS energy thresholding + run-length segments, the
    speech-data curation primitive (silence trimming, per-segment
    transcription batching). Real decoding is stubbed per the sandbox
    contract (``fake=False`` raises); the fake decoder derives a
    CLOSED-FORM deterministic PCM track from the media id so the whole
    chain — framing, integer energies, the corpus-free activity
    threshold, run-length segmentation — is SQL-replayable:

        sample_i = ((seed + i) * 2654435761 mod 2^32) >> 16 - 32768
        (Knuth multiplicative hash; closed form, so the oracle
        list_transform's range(n) reproduces it without iteration)

    A frame (16 samples) is ACTIVE iff its energy (sum of squares,
    exact int64) times n_frames exceeds the track's total energy
    (i.e. above the track mean — per-track adaptive, no global pass).
    Segments = maximal runs of active frames."""

    N_SAMPLES = 256
    FRAME = 16

    def __init__(self, fake: bool = True):
        self.fake = fake

    @classmethod
    def _vad(cls, pcm: "np.ndarray"):
        """Shared VAD rule on an int64 PCM track: 16-sample frame
        energies (exact int64), a frame is ACTIVE iff energy *
        n_frames > total (above the track mean), segments = maximal
        active runs."""
        n_frames = len(pcm) // cls.FRAME
        if n_frames == 0:
            return 0, 0, 0
        e = (pcm[:n_frames * cls.FRAME] ** 2) \
            .reshape(n_frames, cls.FRAME).sum(axis=1)
        total = int(e.sum())
        active = (e * n_frames) > total
        segs = int(np.count_nonzero(
            active & ~np.concatenate([[False], active[:-1]])))
        return n_frames, int(active.sum()), segs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["media_id"].to_numpy(dtype="int64")
        out_frames = np.zeros(len(ids), dtype="int64")
        out_active = np.zeros(len(ids), dtype="int64")
        out_segs = np.zeros(len(ids), dtype="int64")
        if self.fake:
            i = np.arange(self.N_SAMPLES, dtype=np.uint64)
            for r, mid in enumerate(ids):
                s = (((np.uint64(mid) + i) * np.uint64(2654435761))
                     & np.uint64(0xFFFFFFFF)) >> np.uint64(16)
                pcm = s.astype(np.int64) - 32768
                out_frames[r], out_active[r], out_segs[r] = \
                    self._vad(pcm)
        else:
            from warcio_ray.ops.mediacodec import decode_wav

            for r, payload in enumerate(batch["payload"]):
                _rate, pcm = decode_wav(payload or b"")
                out_frames[r], out_active[r], out_segs[r] = \
                    self._vad(pcm)
        return pd.DataFrame({"media_id": ids,
                             "n_frames": out_frames,
                             "n_active": out_active,
                             "n_segments": out_segs})


def vad_segments(media_ds, fake: bool = True, concurrency: int = 4,
                 batch_size: int = 256):
    """Media Dataset -> (media_id, n_frames, n_active, n_segments)
    via the actor-pool VAD stage (decoder state builds once per
    actor)."""
    return media_ds.map_batches(
        AudioVadStage, batch_format="pandas",
        fn_constructor_kwargs={"fake": fake},
        concurrency=(1, concurrency), batch_size=batch_size)


class ImagePatchStage:
    """Actor-pool stage: ViT-style patch grid statistics over an image
    payload — per-patch means, salient-patch counting and the argmax
    crop candidate, the vision-side preprocessing audit (which images
    are flat/boilerplate vs structured). Real decoding stubbed per the
    sandbox contract; the fake decoder derives a CLOSED-FORM
    deterministic 64x64 grayscale image from the media id:

        pixel(x, y) = ((mid + 64*y + x) * 2654435761 mod 2^32) >> 24

    (0..255; same Knuth-hash closed form as the VAD PCM, so the SQL
    oracle replays it with one range(4096) expansion). The image
    splits into an 8x8 grid of 8x8 patches; patch SUM is exact int64;
    a patch is SALIENT iff its sum * 64 exceeds the image total (above
    the image mean); the crop candidate is the (sum desc, patch asc)
    argmax."""

    SIZE = 64
    PATCH = 8

    def __init__(self, fake: bool = True):
        self.fake = fake

    @classmethod
    def _patch_stats(cls, pix: "np.ndarray", patch_of: "np.ndarray"):
        """Shared patch rule on a flat SIZE*SIZE int64 pixel vector:
        exact patch sums, salient iff sum * n_patches > total, crop =
        first argmax."""
        g = cls.SIZE // cls.PATCH
        sums = np.zeros(g * g, dtype="int64")
        np.add.at(sums, patch_of, pix)
        total = int(sums.sum())
        n_sal = int(((sums * (g * g)) > total).sum())
        best = int(np.argmax(sums))             # first max = lowest id
        return n_sal, best, int(sums[best])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["media_id"].to_numpy(dtype="int64")
        g = self.SIZE // self.PATCH
        idx = np.arange(self.SIZE * self.SIZE, dtype=np.uint64)
        px = (idx % self.SIZE).astype(np.int64)
        py = (idx // self.SIZE).astype(np.int64)
        patch_of = (py // self.PATCH) * g + (px // self.PATCH)
        out = {"media_id": ids,
               "n_salient": np.zeros(len(ids), dtype="int64"),
               "best_patch": np.zeros(len(ids), dtype="int64"),
               "best_sum": np.zeros(len(ids), dtype="int64")}
        if self.fake:
            for r, mid in enumerate(ids):
                pix = ((((np.uint64(mid) + idx) * np.uint64(2654435761))
                        & np.uint64(0xFFFFFFFF)) >> np.uint64(24)) \
                    .astype(np.int64)
                (out["n_salient"][r], out["best_patch"][r],
                 out["best_sum"][r]) = self._patch_stats(pix, patch_of)
        else:
            from warcio_ray.ops.mediacodec import (
                block_mean_resize,
                gray_from_bmp,
            )

            for r, payload in enumerate(batch["payload"]):
                pix = block_mean_resize(gray_from_bmp(payload or b""),
                                        self.SIZE, self.SIZE).reshape(-1)
                (out["n_salient"][r], out["best_patch"][r],
                 out["best_sum"][r]) = self._patch_stats(pix, patch_of)
        return pd.DataFrame(out)


def image_patch_stats(media_ds, fake: bool = True, concurrency: int = 4,
                      batch_size: int = 256):
    """Media Dataset -> (media_id, n_salient, best_patch, best_sum)
    via the actor-pool patch stage."""
    return media_ds.map_batches(
        ImagePatchStage, batch_format="pandas",
        fn_constructor_kwargs={"fake": fake},
        concurrency=(1, concurrency), batch_size=batch_size)
