"""Video container writers (`ln3diff_tpu/utils/video.py`).

The AVI test parses the RIFF tree back with struct (no external video
dependency) and decodes each MJPEG frame via PIL, asserting pixel-level
round-trip fidelity.  The GIF test round-trips through PIL's reader.
"""

import struct

import numpy as np
import pytest

from ln3diff_tpu.utils.video import (frames_to_uint8, save_video_avi,
                                     save_video_gif)


def _orbit_frames(n=6, h=32, w=48):
    # smooth frames (JPEG-friendly): shifting gradient, not white noise
    ys = np.linspace(-1, 1, h)[:, None, None] * np.ones((h, w, 3),
                                                        np.float32)
    return np.stack([np.clip(ys + i / n - 0.5, -1, 1) for i in range(n)])


def _parse_riff_chunks(buf, pos, end):
    out = []
    while pos < end:
        fourcc, size = struct.unpack_from('<4sI', buf, pos)
        out.append((fourcc, pos + 8, size))
        pos += 8 + size + (size % 2)
    return out


class TestAVI:

    @pytest.fixture(scope='class')
    def avi(self, tmp_path_factory):
        frames = _orbit_frames()
        path = str(tmp_path_factory.mktemp('v') / 'orbit.avi')
        save_video_avi(frames, path, fps=12, quality=95)
        with open(path, 'rb') as f:
            return frames, f.read()

    def test_riff_structure(self, avi):
        frames, buf = avi
        n, h, w = frames.shape[:3]
        fourcc, size = struct.unpack_from('<4sI', buf, 0)
        assert fourcc == b'RIFF' and buf[8:12] == b'AVI '
        assert size == len(buf) - 8
        tops = _parse_riff_chunks(buf, 12, len(buf))
        kinds = [(f, buf[p:p + 4]) for f, p, _ in tops]
        assert (b'LIST', b'hdrl') in kinds
        assert (b'LIST', b'movi') in kinds
        assert any(f == b'idx1' for f, _, _ in tops)

    def test_header_fields(self, avi):
        frames, buf = avi
        n, h, w = frames.shape[:3]
        hdrl_pos = next(p for f, p, _ in _parse_riff_chunks(buf, 12, len(buf))
                        if f == b'LIST' and buf[p:p + 4] == b'hdrl')
        avih_pos = hdrl_pos + 4 + 8
        assert buf[hdrl_pos + 4:avih_pos] == b'avih' + struct.pack(
            '<I', 56)
        fields = struct.unpack_from('<14I', buf, avih_pos)
        usec, _, _, flags, total, _, streams, _, aw, ah = fields[:10]
        assert usec == 1_000_000 // 12
        assert flags & 0x10          # AVIF_HASINDEX
        assert total == n and streams == 1 and (aw, ah) == (w, h)

    def test_frames_decode(self, avi):
        from PIL import Image
        import io
        frames, buf = avi
        u8 = frames_to_uint8(frames)
        tops = _parse_riff_chunks(buf, 12, len(buf))
        movi_pos, movi_size = next(
            (p, s) for f, p, s in tops
            if f == b'LIST' and buf[p:p + 4] == b'movi')
        dcs = _parse_riff_chunks(buf, movi_pos + 4, movi_pos + movi_size)
        assert len(dcs) == len(frames)
        for i, (fourcc, p, s) in enumerate(dcs):
            assert fourcc == b'00dc'
            img = np.asarray(Image.open(io.BytesIO(buf[p:p + s])))
            assert img.shape == u8[i].shape
            assert np.mean(np.abs(img.astype(np.int32)
                                  - u8[i].astype(np.int32))) < 4.0

    def test_idx1_matches_chunks(self, avi):
        frames, buf = avi
        tops = _parse_riff_chunks(buf, 12, len(buf))
        movi_pos, movi_size = next(
            (p, s) for f, p, s in tops
            if f == b'LIST' and buf[p:p + 4] == b'movi')
        idx_pos, idx_size = next((p, s) for f, p, s in tops if f == b'idx1')
        n_entries = idx_size // 16
        assert n_entries == len(frames)
        for i in range(n_entries):
            cid, flags, off, size = struct.unpack_from(
                '<4sIII', buf, idx_pos + 16 * i)
            assert cid == b'00dc' and flags & 0x10
            # offset counts from the 'movi' fourcc
            chunk_at = movi_pos + off
            got_id, got_size = struct.unpack_from('<4sI', buf, chunk_at)
            assert got_id == b'00dc' and got_size == size


class TestGIF:

    def test_roundtrip(self, tmp_path):
        from PIL import Image
        frames = _orbit_frames(n=4, h=16, w=16)
        path = str(tmp_path / 'orbit.gif')
        save_video_gif(frames, path, fps=10)
        im = Image.open(path)
        assert im.n_frames == 4
        im.seek(2)
        got = np.asarray(im.convert('RGB'))
        want = frames_to_uint8(frames)[2]
        # GIF is 256-color palletized; smooth ramps stay close
        assert np.mean(np.abs(got.astype(np.int32)
                              - want.astype(np.int32))) < 12.0


class TestU8:

    def test_uint8_passthrough_and_range(self):
        u = np.zeros((2, 4, 4, 3), np.uint8)
        assert frames_to_uint8(u) is u
        f = np.array([[[[-1.0, 0.0, 1.0]]]], np.float32)
        out = frames_to_uint8(f)
        assert out.tolist() == [[[[0, 128, 255]]]]
