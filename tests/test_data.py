"""Data pipeline tests on a synthetic Penn-Action-style tree."""

import numpy as np
import pytest

from kpvid_tpu.data import (
    HostDataPipeline,
    ImagePairDataset,
    SequenceDataset,
    VideoFramesDataset,
)
from kpvid_tpu.data.augment import center_crop_box, pair_test_crop_box, rotate_keypoints
from kpvid_tpu.data.keypoint import chunk_frames, pack_chunks, prefetch_videos
from kpvid_tpu.data.synthetic import (
    make_synthetic_penn_tree,
    make_synthetic_pseudo_labels,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("penn")
    make_synthetic_penn_tree(root, n_train=3, n_test=2, frames_per_video=40)
    make_synthetic_pseudo_labels(root, n_pts=6)
    return str(root)


@pytest.fixture(scope="module")
def short_tree(tmp_path_factory):
    # < 33 frames -> exercises the gap<1 midpoint-interpolation branch
    root = tmp_path_factory.mktemp("penn_short")
    make_synthetic_penn_tree(root, n_train=2, n_test=1, frames_per_video=20)
    make_synthetic_pseudo_labels(root, n_pts=6)
    return str(root)


class TestImagePair:
    def test_train_sample(self, tree):
        ds = ImagePairDataset(tree, "train")
        s = ds.sample(0, np.random.default_rng(0))
        assert s["image"].shape == (128, 128, 3)
        assert s["future_image"].shape == (128, 128, 3)
        assert s["image"].dtype == np.float32
        assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0

    def test_test_sample_deterministic(self, tree):
        ds = ImagePairDataset(tree, "test")
        a = ds.sample(0, np.random.default_rng(0))
        b = ds.sample(0, np.random.default_rng(99))
        np.testing.assert_array_equal(a["image"], b["image"])

    def test_train_sample_seeded_reproducible(self, tree):
        ds = ImagePairDataset(tree, "train")
        a = ds.sample(1, np.random.default_rng(7))
        b = ds.sample(1, np.random.default_rng(7))
        np.testing.assert_array_equal(a["image"], b["image"])
        c = ds.sample(1, np.random.default_rng(8))
        assert np.abs(a["image"] - c["image"]).max() > 0

    def test_decode_cache_is_exact(self, tree):
        """Cached samples are bit-identical to uncached ones, on both hit
        and miss paths, for train (augmented) and test (deterministic)."""
        for subset in ("train", "test"):
            plain = ImagePairDataset(tree, subset)
            cached = ImagePairDataset(tree, subset, decode_cache_mb=64)
            for idx in (0, 1, 0, 1, 0):  # repeats exercise the hit path
                a = plain.sample(idx, np.random.default_rng(idx))
                b = cached.sample(idx, np.random.default_rng(idx))
                np.testing.assert_array_equal(a["image"], b["image"])
                np.testing.assert_array_equal(a["future_image"], b["future_image"])
        stats = cached.cache.stats()
        assert stats["hits"] > 0 and stats["entries"] > 0

    def test_decode_cache_lru_budget(self, tree):
        from kpvid_tpu.data.cache import FrameCache

        # each entry 1 MB; budget 3 MB -> at most 3 live entries
        cache = FrameCache(3)
        arr = np.zeros((512, 1024 // 2, 4), np.uint8)  # 1 MiB
        import PIL.Image

        for i in range(8):
            cache.get(("v", i), lambda: PIL.Image.fromarray(arr[..., :3]))
        s = cache.stats()
        assert s["entries"] <= 4 and s["bytes"] <= 4 * arr[..., :3].nbytes
        # most-recent key is still resident (a hit, not a re-decode)
        cache.get(("v", 7), lambda: (_ for _ in ()).throw(AssertionError("evicted")))


class TestSequence:
    def test_strided_branch(self, tree):
        ds = SequenceDataset(tree, "train", n_pts=6, n_action=9)
        s = ds.sample(0, np.random.default_rng(0))
        assert s["image"].shape == (128, 128, 3)
        assert s["keypoints"].shape == (6, 2)
        assert s["real_seq"].shape == (32, 6, 2)
        assert s["action_code"].shape == (9,)
        assert s["action_code"].sum() == 1.0

    def test_interp_branch(self, short_tree):
        """file_len=20 < 33 -> 17 frames midpoint-interpolated to 33."""
        ds = SequenceDataset(
            short_tree, "train", n_pts=6, n_action=9, augment_samples=False,
            random_order=False,
        )
        s = ds.sample(0, np.random.default_rng(0))
        assert s["real_seq"].shape == (32, 6, 2)
        # interleave law: seq[1] (=real_seq[0]) is the midpoint of
        # seq[0] (=keypoints) and seq[2] (=real_seq[1])
        np.testing.assert_allclose(
            s["real_seq"][0], (s["keypoints"] + s["real_seq"][1]) / 2.0, atol=1e-6
        )

    def test_with_image_seq(self, tree):
        ds = SequenceDataset(
            tree, "test", n_pts=6, n_action=9, with_image_seq=True
        )
        s = ds.sample(0, np.random.default_rng(0))
        assert s["real_im_seq"].shape == (32, 128, 128, 3)

    def test_flip_negates_x(self, tree):
        ds = SequenceDataset(tree, "train", n_pts=6, n_action=9)
        # find seeds with/without flip by checking determinism contract only
        a = ds.sample(0, np.random.default_rng(3))
        b = ds.sample(0, np.random.default_rng(3))
        np.testing.assert_array_equal(a["real_seq"], b["real_seq"])


class TestKeypointVideos:
    def test_uint8_loading_equals_float(self, tree):
        """The labeler's uint8 wire format + on-device mapping is the same
        math as host-side float loading (u8/255*2-1)."""
        f = VideoFramesDataset(tree, "test").load_video(0)
        u = VideoFramesDataset(tree, "test", as_uint8=True).load_video(0)
        assert u.dtype == np.uint8
        np.testing.assert_allclose(
            u.astype(np.float32) / 255.0 * 2.0 - 1.0, f, rtol=0, atol=1e-6
        )

    def test_iter_and_chunk(self, tree):
        ds = VideoFramesDataset(tree, "test")
        vid, n, frames = next(ds.iter_videos())
        assert frames.shape == (n, 128, 128, 3)
        chunks = list(chunk_frames(frames, 16))
        assert all(c.shape == (16, 128, 128, 3) for c in chunks)
        assert len(chunks) == -(-n // 16)
        # padded tail is zeros
        tail_valid = n - (len(chunks) - 1) * 16
        if tail_valid < 16:
            assert np.all(chunks[-1][tail_valid:] == 0)

    def test_pack_chunks_spans_videos_and_reassembles(self):
        """Every frame of every video lands in exactly one slab row, in
        order; padding only in the final slab; the segment map scatters
        results back to per-video arrays exactly."""
        rng = np.random.default_rng(0)
        lengths = [5, 12, 3, 7, 1]  # mixed, mostly < chunk
        chunk = 8
        videos = [
            (100 + i, n, rng.normal(size=(n, 2, 2, 1)).astype(np.float32))
            for i, n in enumerate(lengths)
        ]
        slabs = list(pack_chunks(iter(videos), chunk))
        total = sum(lengths)
        assert len(slabs) == -(-total // chunk)
        # padding rows appear only at the very end
        n_pad = len(slabs) * chunk - total
        if n_pad:
            assert np.all(slabs[-1][0][chunk - n_pad :] == 0)
        # reassemble per video via the segment map (simulating a per-frame
        # device op with the identity) and compare to the source frames
        out = {vid: np.empty((n, 2, 2, 1), np.float32) for vid, n, _ in videos}
        counts = dict.fromkeys(out, 0)
        for slab, segs in slabs:
            for vid, n, v_off, s_off, count in segs:
                out[vid][v_off : v_off + count] = slab[s_off : s_off + count]
                counts[vid] += count
        for vid, n, frames in videos:
            assert counts[vid] == n
            np.testing.assert_array_equal(out[vid], frames)

    def test_prefetch_videos_order_and_errors(self):
        videos = [(i, 2, np.full((2, 1), i, np.float32)) for i in range(5)]
        got = list(prefetch_videos(iter(videos), depth=2))
        assert [v[0] for v in got] == [0, 1, 2, 3, 4]

        def boom():
            yield videos[0]
            raise RuntimeError("decode failed")

        it = prefetch_videos(boom(), depth=1)
        next(it)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="decode failed"):
            list(it)


class TestAugmentMath:
    def test_rotate_keypoints_90(self):
        kp = np.array([[[1.0, 0.0]]])
        out = rotate_keypoints(kp, 90)
        # PIL rotates CCW; a point on +x moves to -y in raster coords
        np.testing.assert_allclose(out, [[[0.0, -1.0]]], atol=1e-7)

    def test_rotate_roundtrip(self):
        kp = np.random.default_rng(0).uniform(-1, 1, (5, 4, 2))
        out = rotate_keypoints(rotate_keypoints(kp, 33), -33)
        np.testing.assert_allclose(out, kp, atol=1e-12)

    def test_crop_boxes(self):
        # landscape: both boxes center x
        box, ratio = center_crop_box((200, 150), 128)
        assert box[1] == 0 and box[3] == 128
        assert box[2] - box[0] == 128
        # portrait: center_crop centers y, pair_test crop is top-aligned (Q8)
        box_c, _ = center_crop_box((150, 200), 128)
        assert box_c[0] == 0 and box_c[2] == 128 and box_c[1] > 0
        box_q, _ = pair_test_crop_box((150, 200), 128)
        assert box_q[1] == 0 and box_q[3] == 128


class TestPipeline:
    def test_batches_shapes_and_order(self, tree):
        ds = ImagePairDataset(tree, "test")
        pipe = HostDataPipeline(ds, batch_size=2, num_workers=3, seed=0)
        batches = list(pipe.batches())
        assert batches[0]["image"].shape == (2, 128, 128, 3)
        # test split has 2 videos -> one batch, no remainder
        assert len(batches) == 1

    def test_remainder_kept_in_eval(self, tree):
        ds = ImagePairDataset(tree, "train", augment_samples=False, random_pairs=False)
        pipe = HostDataPipeline(ds, batch_size=2, num_workers=2, seed=0)
        batches = list(pipe.batches())
        # 3 train videos -> [2, 1]
        assert [b["image"].shape[0] for b in batches] == [2, 1]

    def test_deterministic_across_worker_counts(self, tree):
        ds = ImagePairDataset(tree, "train")
        a = list(HostDataPipeline(ds, 2, num_workers=1, seed=5, drop_remainder=True).batches())
        b = list(HostDataPipeline(ds, 2, num_workers=4, seed=5, drop_remainder=True).batches())
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["image"], y["image"])

    def test_repeat_stream(self, tree):
        ds = ImagePairDataset(tree, "train")
        pipe = HostDataPipeline(ds, 2, shuffle=True, repeat=True, num_workers=2, seed=1)
        it = pipe.batches()
        got = [next(it) for _ in range(5)]  # > one epoch worth
        assert all(g["image"].shape == (2, 128, 128, 3) for g in got)

    def test_resume_continues_exact_stream(self, tree):
        """start_sample=k resumes the EXACT sample stream an uninterrupted
        run would have produced from position k (train.py resume passes
        step * batch_size); spans an epoch boundary (3 train videos)."""
        ds = ImagePairDataset(tree, "train")
        kw = dict(shuffle=True, repeat=True, num_workers=2, seed=7)
        full = HostDataPipeline(ds, 1, **kw).samples()
        reference = [next(full) for _ in range(8)]
        resumed = HostDataPipeline(ds, 1, start_sample=5, **kw).samples()
        for want in reference[5:]:
            got = next(resumed)
            np.testing.assert_array_equal(got["image"], want["image"])
            np.testing.assert_array_equal(got["future_image"], want["future_image"])


class TestHostSharding:
    def test_shards_partition_epoch(self, tree):
        ds = ImagePairDataset(tree, "train", augment_samples=False, random_pairs=False)
        # collect the (epoch, idx) streams of both shards
        def indices(shard_id, num_shards):
            pipe = HostDataPipeline(
                ds, 1, shuffle=True, num_workers=1, seed=3,
                shard_id=shard_id, num_shards=num_shards,
            )
            return [i for _, i in pipe._index_stream()]

        full = indices(0, 1)
        s0, s1 = indices(0, 2), indices(1, 2)
        assert sorted(s0 + s1) == sorted(full)
        assert not set(s0) & set(s1)

    def test_len_accounts_for_shard(self, tree):
        ds = ImagePairDataset(tree, "train", augment_samples=False, random_pairs=False)
        assert len(HostDataPipeline(ds, 1, num_shards=1)) == 3
        assert len(HostDataPipeline(ds, 1, shard_id=0, num_shards=2)) == 2
        assert len(HostDataPipeline(ds, 1, shard_id=1, num_shards=2)) == 1

    def test_bad_shard_id(self, tree):
        ds = ImagePairDataset(tree, "train")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            HostDataPipeline(ds, 1, shard_id=2, num_shards=2)
