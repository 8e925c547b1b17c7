"""Native ingest kernels (C++ via ctypes) and interleaved-capture support."""

import dataclasses

import numpy as np
import pytest

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io import native
from passiveradar_tpu.io.hdf5 import CaptureReader
from passiveradar_tpu.io.synthetic import Target, write_synth_capture

from tests.test_pipeline import TINY


def test_native_library_builds():
    assert native.build_library() is not None, "g++ build of pr_io.cc failed"


def test_i16_to_f32_matches_numpy(rng):
    x = rng.integers(-32768, 32767, 1000).astype(np.int16)
    got = native.i16_to_f32(x, 1.0 / 32768)
    want = x.astype(np.float32) / 32768
    assert np.array_equal(got, want)


def test_demux2_float_matches_reference_split(rng):
    raw = rng.standard_normal(4 * 500).astype(np.float32)
    ref, srv = native.demux2(raw)
    # reference semantics: deinterleave_IQ then even/odd channel split
    # (main.py:59-65)
    cplx = raw[0::2] + 1j * raw[1::2]
    assert np.array_equal(ref, cplx[0::2].astype(np.complex64))
    assert np.array_equal(srv, cplx[1::2].astype(np.complex64))


def test_demux2_int16(rng):
    raw = rng.integers(-1000, 1000, 4 * 300).astype(np.int16)
    ref, srv = native.demux2(raw, scale=0.5)
    want_ref = (raw[0::4] * 0.5 + 1j * raw[1::4] * 0.5).astype(np.complex64)
    want_srv = (raw[2::4] * 0.5 + 1j * raw[3::4] * 0.5).astype(np.complex64)
    assert np.allclose(ref, want_ref)
    assert np.allclose(srv, want_srv)


@pytest.fixture(scope="module")
def tiny_cfg():
    return derive_config(TINY)


def test_interleaved_capture_matches_separate(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    n_frames = 3
    kw = dict(targets=(Target(40, 20.0, 0.1),), seed=3)
    sep = str(tmp_path / "sep.hdf5")
    inter = str(tmp_path / "inter.hdf5")
    write_synth_capture(sep, cfg, n_frames, interleaved=False, **kw)
    write_synth_capture(inter, cfg, n_frames, interleaved=True, **kw)

    r1 = CaptureReader(cfg, sep, estimate_offset=False)
    cfg_i = dataclasses.replace(cfg, interleaved_input_channels=True)
    r2 = CaptureReader(cfg_i, inter, estimate_offset=False)
    assert r1.num_frames == r2.num_frames >= n_frames

    a_ref, a_srv = r1.read_iq_frames(0, 2)
    b_ref, b_srv = r2.read_iq_frames(0, 2)
    assert np.array_equal(a_ref, b_ref)
    assert np.array_equal(a_srv, b_srv)
    r1.close(), r2.close()


def test_interleaved_offset_estimation(tiny_cfg, tmp_path):
    cfg = dataclasses.replace(tiny_cfg, interleaved_input_channels=True)
    path = str(tmp_path / "cap_i.hdf5")
    write_synth_capture(path, cfg, 4, interleaved=True, channel_offset=9,
                        targets=())
    r = CaptureReader(cfg, path, max_offset_lags=2000)
    assert r.offset == -9
    ref, srv = r.read_iq_frames(0, 1)
    assert ref.shape == srv.shape == (1, cfg.input_chunk_length // 2)
    r.close()


def test_int16_capture_roundtrip(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    path16 = str(tmp_path / "cap16.hdf5")
    path32 = str(tmp_path / "cap32.hdf5")
    kw = dict(targets=(Target(40, 20.0, 0.1),), seed=5)
    write_synth_capture(path16, cfg, 3, dtype=np.int16, **kw)
    write_synth_capture(path32, cfg, 3, **kw)
    r16 = CaptureReader(cfg, path16, estimate_offset=False, int16_scale=1.0)
    r32 = CaptureReader(cfg, path32, estimate_offset=False)
    a, _ = r16.read_iq_frames(0, 1)
    b, _ = r32.read_iq_frames(0, 1)
    # int16 quantisation at full scale ~32000 → correlation must be ~1
    a = a / np.abs(a).mean()
    b = b / np.abs(b).mean()
    corr = np.abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.999
    r16.close(), r32.close()
