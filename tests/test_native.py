"""Native C++ feature DB: equivalence with the Python implementation."""

import subprocess

import numpy as np
import pytest

from plviwo_tpu import native


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", "/root/repo/native"], check=True,
                   capture_output=True)


def _feed_both(ndb, pdb, rng):
    for frame in range(10):
        t = 0.1 * frame
        n = rng.integers(5, 15)
        fids = rng.integers(0, 30, size=n)
        fids = np.unique(fids)
        uvs = rng.uniform(0, 640, size=(len(fids), 2))
        uvns = uvs / 300.0 - 1.0
        ndb.update_batch(fids, t, uvs, uvns)
        for fid, uv, uvn in zip(fids, uvs, uvns):
            pdb.update(int(fid), t, uv, uvn)


def test_native_available():
    assert native.available(), "libplviwo_native.so failed to build/load"


def test_size_and_cleanup_match():
    rng = np.random.default_rng(0)
    ndb = native.NativeFeatureDatabase()
    from plviwo_tpu.update.feature_db import FeatureDatabase

    pdb = FeatureDatabase()
    _feed_both(ndb, pdb, rng)
    assert len(ndb) == len(pdb)
    ndb.cleanup(0.45)
    pdb.cleanup(0.45)
    assert len(ndb) == len(pdb)
    ndb.remove([1, 2, 3])
    pdb.remove([1, 2, 3])
    assert len(ndb) == len(pdb)


def test_export_matches_python_path():
    """The padded MSCKF batch from C++ must match the Python assembly."""
    rng = np.random.default_rng(1)
    ndb = native.NativeFeatureDatabase()
    from plviwo_tpu.update.feature_db import FeatureDatabase

    pdb = FeatureDatabase()
    _feed_both(ndb, pdb, rng)

    clone_t = np.array([0.3, 0.4, 0.5, 0.6, 0.8, 0.9])
    clone_slot = np.array([5, 0, 3, 1, 2, 4], dtype=np.int32)
    marg_t = [0.3]
    t_frame = 0.9
    F, O = 16, 8

    n, fids, uv, uvn, s0, s1, lam, obs_t, valid = ndb.export_msckf(
        clone_t, clone_slot, marg_t, t_frame, 3, F, O)

    # python reference assembly (same logic as core/system.py fallback)
    tmap = {t: s for t, s in zip(clone_t, clone_slot)}

    def locate(ti):
        for tc, sc in tmap.items():
            if abs(tc - ti) < 1e-9:
                return sc, sc, 0.0
        if not (clone_t[0] < ti < clone_t[-1]):
            return None
        j = int(np.searchsorted(clone_t, ti))
        lam_ = (ti - clone_t[j - 1]) / (clone_t[j] - clone_t[j - 1])
        return int(clone_slot[j - 1]), int(clone_slot[j]), lam_

    cands = []
    for fid, tr in pdb.tracks.items():
        usable = sum(1 for ti in tr.times if locate(ti) is not None)
        if usable < 3:
            continue
        lost = tr.times[-1] < t_frame - 1e-9
        hits = any(abs(ti - m) < 1e-9 for ti in tr.times for m in marg_t)
        if lost or hits:
            cands.append((usable, fid))
    cands.sort(reverse=True)
    cands = cands[:F]

    assert n == len(cands), (n, len(cands))
    # same candidate sets (order may differ among equal-usable features)
    assert set(fids[:n].tolist()) == {fid for _, fid in cands}
    # per-feature rows must match the python locate() on the same feature
    for i in range(n):
        tr = pdb.tracks[int(fids[i])]
        expect = [locate(ti) for ti in tr.times]
        expect = [e for e in expect if e is not None][:O]
        got_valid = valid[i]
        assert got_valid.sum() == len(expect)
        for j, (es0, es1, elam) in enumerate(expect):
            assert s0[i, j] == es0 and s1[i, j] == es1
            np.testing.assert_allclose(lam[i, j], elam, atol=1e-12)


def test_system_runs_with_native():
    """End-to-end smoke: the system must produce identical-quality results
    with the native DB active (it is auto-enabled when built)."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem

    sys_ = VioSystem(EstimatorOptions())
    assert sys_.fdb_native is not None



def test_native_csv_matches_python():
    """Native CSV parser (csv_loader.cpp) must match the Python parser on
    KAIST-style files including malformed lines."""
    import os
    import tempfile

    import numpy as np

    from plviwo_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "test.csv")
        with open(path, "w") as f:
            f.write("# header line with text\n")
            for i in range(500):
                vals = rng.normal(size=14)
                vals[0] = 1.5e18 + i * 1e7
                f.write(",".join(f"{v!r}" for v in vals) + "\n")
            f.write("bad,line,with,text\n")
            f.write("\n")
            f.write(" ".join("1.0" for _ in range(14)) + "\n")

        # python reference parse (the pre-native implementation)
        rows = []
        with open(path) as fh:
            for line in fh:
                parts = line.strip().replace(",", " ").split()
                if not parts:
                    continue
                try:
                    rows.append([float(x) for x in parts])
                except ValueError:
                    continue
        ref = np.asarray(rows)
        got = native.load_csv(path, 0)
        np.testing.assert_array_equal(got, ref)
        # truncated-columns variant
        got4 = native.load_csv(path, 4)
        np.testing.assert_array_equal(got4, ref[:, :4])
