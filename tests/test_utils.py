"""Coverage for utils (io edge cases, timing harness) and api edge engines."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from blur_algorithms_tpu import Engine, blur_u8
from blur_algorithms_tpu.utils import io
from blur_algorithms_tpu.utils.timing import BenchResult, time_fn, time_fn_chained


class TestIO:
    def test_grayscale_png_round_trip(self, tmp_path, rng):
        img = (rng.random((20, 30)) * 255).astype(np.uint8)
        path = str(tmp_path / "g.png")
        io.write_image(path, img)
        back = io.read_image(path)  # PIL converts to RGB
        assert back.shape == (20, 30, 3)
        np.testing.assert_array_equal(back[..., 0], img)

    def test_ppm_with_comments(self, tmp_path):
        path = tmp_path / "c.ppm"
        path.write_bytes(b"P6\n# a comment\n2 2\n255\n" + bytes(range(12)))
        img = io.read_image(str(path))
        assert img.shape == (2, 2, 3)
        assert img[0, 0, 0] == 0 and img[1, 1, 2] == 11

    def test_bad_ppm_magic(self, tmp_path):
        path = tmp_path / "bad.ppm"
        path.write_bytes(b"P3\n2 2\n255\n")
        with pytest.raises(ValueError, match="magic"):
            io.read_image(str(path))

    def test_npy_requires_uint8(self, tmp_path):
        path = tmp_path / "f.npy"
        np.save(str(path), np.zeros((4, 4, 3), np.float32))
        with pytest.raises(ValueError, match="uint8"):
            io.read_image(str(path))


class TestTiming:
    def test_time_fn_reports(self):
        r = time_fn(lambda x: x + 1, jnp.zeros(16), iters=3, warmup=1,
                    name="t", megapixels=1.0)
        assert isinstance(r, BenchResult)
        assert r.min_ms <= r.median_ms
        assert r.mpix_per_s and r.mpix_per_s > 0
        assert "t:" in str(r)

    def test_time_fn_chained_shape_preserving(self):
        r = time_fn_chained(lambda: (lambda x: x * 2.0), jnp.ones((8, 8)),
                            iters=3, reps=2, name="c")
        assert r.median_ms > 0

    def test_time_fn_chained_suspect_on_swamped_delta(self, monkeypatch):
        """A chained delta that stays <= 0 is remeasured (accumulating
        mins) and, if unrecoverable, reported suspect instead of as a
        bogus near-zero time (the sweep's 0.00 ms / 33 TP/s artifact)."""
        from blur_algorithms_tpu.utils import timing as tmod

        # scripted clock: every timed span measures the SAME duration, so
        # tn - t1 == 0 forever -> all retries fire, suspect is set
        t = {"now": 0.0}

        def fake_clock():
            t["now"] += 0.5
            return t["now"]

        monkeypatch.setattr(tmod.time, "perf_counter", fake_clock)
        r = tmod.time_fn_chained(
            lambda: (lambda x: x * 2.0), jnp.ones((8, 8)),
            iters=3, reps=2, name="s",
        )
        assert r.suspect
        assert "SUSPECT" in str(r)
        assert r.iters == 3 * 2 * 4  # base reps + 3 retry rounds

    def test_time_fn_chained_not_suspect_normally(self):
        r = time_fn_chained(lambda: (lambda x: x * 2.0), jnp.ones((8, 8)),
                            iters=3, reps=2, name="c")
        assert not r.suspect


class TestEdgeEngines:
    def test_fft_stream_u8_api_small(self, rng):
        img = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
        got = np.asarray(blur_u8(jnp.asarray(img), 3.0, engine=Engine.FFT_STREAM))
        want = np.asarray(blur_u8(jnp.asarray(img), 3.0, engine=Engine.FFT_TILES))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_cascade_u8_api_small_sigma_single_step(self, rng):
        img = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
        got = np.asarray(blur_u8(jnp.asarray(img), 2.0, engine=Engine.CASCADE))
        want = np.asarray(blur_u8(jnp.asarray(img), 2.0, engine=Engine.FUSED))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


class TestPersistentCache:
    """utils/cache.py: cross-process XLA compile cache (CLI analog of the
    reference's in-process pocketfft plan cache, Source.cpp:4-5)."""

    def _reset(self):
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
        # the cache singleton binds to the first dir used in the process
        # (jax._src.compilation_cache: "initialization is done at most
        # once") — drop it so each test really targets its own tmp dir.
        # Private API: tolerate its absence in future jax releases (the
        # config reset above still detaches the dir).
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except (ImportError, AttributeError):
            pass

    def test_enables_and_creates_dir(self, tmp_path):
        import jax

        from blur_algorithms_tpu.utils.cache import enable_persistent_cache

        d = str(tmp_path / "xla_cache")
        try:
            got = enable_persistent_cache(d)
            assert got == d
            assert os.path.isdir(d)
            assert jax.config.jax_compilation_cache_dir == d
        finally:
            self._reset()

    def test_env_opt_out(self, tmp_path, monkeypatch):
        from blur_algorithms_tpu.utils.cache import enable_persistent_cache

        monkeypatch.setenv("BLUR_TPU_NO_COMPILE_CACHE", "1")
        assert enable_persistent_cache(str(tmp_path / "x")) is None
        assert not (tmp_path / "x").exists()

    def test_env_opt_out_is_affirmative(self, tmp_path, monkeypatch):
        # =0 / empty do NOT disable (the documented convention is =1)
        from blur_algorithms_tpu.utils.cache import enable_persistent_cache

        monkeypatch.setenv("BLUR_TPU_NO_COMPILE_CACHE", "0")
        d = str(tmp_path / "y")
        try:
            assert enable_persistent_cache(d) == d
        finally:
            self._reset()

    def test_env_dir_override(self, tmp_path, monkeypatch):
        from blur_algorithms_tpu.utils.cache import enable_persistent_cache

        d = str(tmp_path / "via_env")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", d)
        try:
            assert enable_persistent_cache() == d
        finally:
            self._reset()

    def test_compiled_program_persisted(self, tmp_path):
        """A jitted program lands in the cache dir (min thresholds zeroed)."""
        import jax

        from blur_algorithms_tpu.utils.cache import enable_persistent_cache

        d = str(tmp_path / "xla_cache")
        self._reset()  # detach from any dir an earlier test bound
        try:
            assert enable_persistent_cache(d, min_compile_secs=0.0) == d

            @jax.jit
            def f(x):
                return (x * 2.0 + 1.0).sum()

            f(jnp.arange(64.0).reshape(8, 8)).block_until_ready()
            assert os.listdir(d), "no cache entry written"
        finally:
            self._reset()
