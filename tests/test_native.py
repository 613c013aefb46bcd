"""Native host runtime: C++ compaction + async diagnostics flusher."""

import numpy as np

from warpx_tpu.native import AsyncFlusher, compact, native_available


def test_native_compact_matches_numpy():
    rng = np.random.default_rng(0)
    n = 100_001
    mask = rng.random(n) < 0.37
    arrays = [rng.normal(size=n) for _ in range(7)]
    outs = compact(mask, arrays)
    for a, o in zip(arrays, outs):
        np.testing.assert_array_equal(o, a[mask])
    # f32 path
    arrays32 = [a.astype(np.float32) for a in arrays]
    outs32 = compact(mask, arrays32)
    for a, o in zip(arrays32, outs32):
        np.testing.assert_array_equal(o, a[mask])
    # mixed dtypes fall back to numpy
    outs_mixed = compact(mask, [arrays[0], arrays32[1]])
    np.testing.assert_array_equal(outs_mixed[0], arrays[0][mask])


def test_native_lib_builds():
    # the image ships g++; the native path must actually be exercised in CI
    assert native_available()


def test_async_flusher(tmp_path):
    import time

    fl = AsyncFlusher()
    done = []

    def slow_write(i):
        time.sleep(0.02)
        (tmp_path / f"f{i}").write_text(str(i))
        done.append(i)

    for i in range(5):
        fl.submit(slow_write, i)
    fl.drain()
    assert sorted(done) == list(range(5))
    fl.close()

    # errors surface on the next interaction
    fl2 = AsyncFlusher()
    fl2.submit(lambda: 1 / 0)
    import pytest

    with pytest.raises(ZeroDivisionError):
        fl2.drain()
    fl2.close()
