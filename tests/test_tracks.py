"""SoA track store tests: behavioral parity with the reference's
pointTracking/Track semantics (SURVEY.md §3.4), via index-based association."""

import numpy as np
import jax.numpy as jnp

from meatmodeler_tpu import tracks as tr


def step(store, prev_kf, kf, pairs, prev_xy, curr_xy, m_cap=8):
    """Helper: pairs = [(q, t), ...] match index pairs."""
    q = np.full(m_cap, 0, np.int32)
    t = np.full(m_cap, 0, np.int32)
    mask = np.zeros(m_cap, bool)
    for i, (qi, ti) in enumerate(pairs):
        q[i], t[i], mask[i] = qi, ti, True
    return tr.update_tracks(
        store,
        jnp.asarray(prev_kf),
        jnp.asarray(kf),
        jnp.asarray(q),
        jnp.asarray(t),
        jnp.asarray(mask),
        jnp.asarray(prev_xy, jnp.float32),
        jnp.asarray(curr_xy, jnp.float32),
    )


def make_xy(n, seed):
    return np.random.default_rng(seed).uniform(0, 100, size=(n, 2)).astype(np.float32)


class TestUpdateTracks:
    def test_birth_extend_pop(self):
        store = tr.make_store(16, 8)
        xy0, xy1, xy2 = make_xy(6, 0), make_xy(6, 1), make_xy(6, 2)

        # KF 0 -> 1: two matches spawn two tracks.
        store = step(store, 0, 1, [(0, 3), (2, 4)], xy0, xy1)
        assert np.asarray(store.alive).sum() == 2
        assert np.asarray(store.used).sum() == 2

        # KF 1 -> 2: feature 3 (track A's latest) matches again; feature 4
        # (track B) does not -> B pops. One brand-new match spawns C.
        store = step(store, 1, 2, [(3, 0), (5, 1)], xy1, xy2)
        alive = np.asarray(store.alive)
        used = np.asarray(store.used)
        assert alive.sum() == 2  # A extended + C born
        assert used.sum() == 3  # B still recorded (popped but used)

        # Track A has 3 observations with the right coordinates.
        coords = np.asarray(store.coords)
        masks = np.asarray(store.obs_mask)
        a = np.nonzero(masks.sum(1) == 3)[0]
        assert len(a) == 1
        np.testing.assert_allclose(coords[a[0], 0], xy0[0])
        np.testing.assert_allclose(coords[a[0], 1], xy1[3])
        np.testing.assert_allclose(coords[a[0], 2], xy2[0])

    def test_matches_reference_simulation(self):
        """Random multi-keyframe run compared against a NumPy re-simulation
        of the reference's pointTracking semantics (index-based)."""
        rng = np.random.default_rng(3)
        n_feat, n_kf = 30, 6
        store = tr.make_store(256, n_kf + 1)

        # Reference-style simulation state: list of dicts.
        ref_tracks = []  # each: {"obs": {kf: idx}, "last": feat_idx, "alive": bool}

        xys = [make_xy(n_feat, 100 + k) for k in range(n_kf + 1)]
        for kf in range(1, n_kf + 1):
            # Random one-to-one matches.
            n_m = rng.integers(5, 15)
            qs = rng.choice(n_feat, size=n_m, replace=False)
            ts = rng.choice(n_feat, size=n_m, replace=False)
            pairs = list(zip(qs.tolist(), ts.tolist()))

            store = step(store, kf - 1, kf, pairs, xys[kf - 1], xys[kf], m_cap=32)

            # Reference semantics.
            consumed = set()
            for trk in ref_tracks:
                if not trk["alive"]:
                    continue
                hit = next(((q, t) for q, t in pairs if q == trk["last"]), None)
                if hit is not None:
                    trk["obs"][kf] = hit[1]
                    trk["last"] = hit[1]
                    consumed.add(hit)
                else:
                    trk["alive"] = False
            for q, t in pairs:
                if (q, t) not in consumed:
                    ref_tracks.append({"obs": {kf - 1: q, kf: t}, "last": t, "alive": True})

        # Compare: same multiset of observation patterns.
        masks = np.asarray(store.obs_mask)[np.asarray(store.used)]
        ours = sorted(tuple(np.nonzero(m)[0]) for m in masks)
        theirs = sorted(tuple(sorted(trk["obs"])) for trk in ref_tracks)
        assert ours == theirs

    def test_capacity_overflow_drops_new_tracks(self):
        store = tr.make_store(2, 4)
        xy = make_xy(8, 5)
        store = step(store, 0, 1, [(0, 0), (1, 1), (2, 2)], xy, xy)
        assert np.asarray(store.used).sum() == 2  # third dropped, no crash

    def test_triangulation_endpoints(self):
        store = tr.make_store(8, 5)
        xy0, xy1, xy2 = make_xy(4, 6), make_xy(4, 7), make_xy(4, 8)
        store = step(store, 0, 1, [(0, 1)], xy0, xy1)
        store = step(store, 1, 2, [(1, 2)], xy1, xy2)
        first_kf, last_kf, first_xy, last_xy, valid = tr.triangulation_endpoints(store)
        v = np.asarray(valid)
        assert v.sum() == 1
        t = np.nonzero(v)[0][0]
        assert int(np.asarray(first_kf)[t]) == 0
        assert int(np.asarray(last_kf)[t]) == 2
        np.testing.assert_allclose(np.asarray(first_xy)[t], xy0[0])
        np.testing.assert_allclose(np.asarray(last_xy)[t], xy2[2])

    def test_to_ba_arrays(self):
        store = tr.make_store(8, 5)
        xy0, xy1, xy2 = make_xy(4, 9), make_xy(4, 10), make_xy(4, 11)
        store = step(store, 0, 1, [(0, 1), (2, 3)], xy0, xy1)
        store = step(store, 1, 2, [(1, 0)], xy1, xy2)
        pts, obs, fidx, pidx, ids, obs_oct = tr.to_ba_arrays(store)
        # Track 0: 3 obs; track 1: 2 obs -> 5 observations total.
        assert obs.shape == (5, 2)
        assert obs_oct.shape == (5,)
        assert set(zip(pidx.tolist(), fidx.tolist())) == {
            (0, 0), (0, 1), (0, 2), (1, 0), (1, 1),
        }


class TestCompatView:
    def test_track_class_api(self):
        t = tr.Track(0, (1.0, 2.0), 1, (3.0, 4.0))
        assert t.getCoordinate(0) == (1.0, 2.0)
        t.update(2, (5.0, 6.0))
        assert t.wasUpdated()
        t.reset()
        assert not t.wasUpdated()
        f1, f2, a, b = t.getTriangulationData()
        assert (f1, f2) == (0, 2)
        assert a == (1.0, 2.0) and b == (5.0, 6.0)

    def test_views_from_store(self):
        store = tr.make_store(8, 5)
        xy0, xy1 = make_xy(4, 12), make_xy(4, 13)
        store = step(store, 0, 1, [(0, 1)], xy0, xy1)
        views = tr.views_from_store(store)
        assert len(views) == 1
        f1, f2, a, b = views[0].getTriangulationData()
        assert (f1, f2) == (0, 1)


class TestUpdateTracksScan:
    def test_scan_matches_per_pair_loop(self):
        """update_tracks_scan (one compiled scan) must evolve the store
        identically to calling update_tracks per keyframe pair."""
        rng = np.random.default_rng(3)
        n_kf, k_feats, m_cap = 6, 12, 10
        xy = rng.uniform(0, 100, size=(n_kf, k_feats, 2)).astype(np.float32)
        q = rng.integers(0, k_feats, size=(n_kf - 1, m_cap)).astype(np.int32)
        t = rng.integers(0, k_feats, size=(n_kf - 1, m_cap)).astype(np.int32)
        mask = rng.random(size=(n_kf - 1, m_cap)) < 0.6
        # distinct query indices per pair (a feature matches at most once)
        for k in range(n_kf - 1):
            _, first = np.unique(q[k], return_index=True)
            keep = np.zeros(m_cap, bool)
            keep[first] = True
            mask[k] &= keep

        loop = tr.make_store(32, n_kf)
        for k in range(n_kf - 1):
            loop = tr.update_tracks(
                loop,
                jnp.asarray(k),
                jnp.asarray(k + 1),
                jnp.asarray(q[k]),
                jnp.asarray(t[k]),
                jnp.asarray(mask[k]),
                jnp.asarray(xy[k]),
                jnp.asarray(xy[k + 1]),
            )
        scan = tr.update_tracks_scan(
            tr.make_store(32, n_kf),
            jnp.asarray(q),
            jnp.asarray(t),
            jnp.asarray(mask),
            jnp.asarray(xy),
        )
        for name in tr.TrackStore._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(loop, name)), np.asarray(getattr(scan, name)), err_msg=name
            )


class TestOctavePropagation:
    def test_per_observation_octaves(self):
        """Each observation records its keypoint's own detection octave:
        birth writes both endpoints, extension writes the new keyframe."""
        store = tr.make_store(8, 4)
        xy = np.zeros((3, 4, 2), np.float32)
        oct_per_kf = np.array([[0, 1, 2, 0], [3, 0, 1, 0], [0, 5, 0, 0]], np.int32)

        def one(store, k, pairs):
            q = np.zeros(4, np.int32); t = np.zeros(4, np.int32); m = np.zeros(4, bool)
            for i, (qi, ti) in enumerate(pairs):
                q[i], t[i], m[i] = qi, ti, True
            return tr.update_tracks(
                store, jnp.asarray(k), jnp.asarray(k + 1),
                jnp.asarray(q), jnp.asarray(t), jnp.asarray(m),
                jnp.asarray(xy[k]), jnp.asarray(xy[k + 1]),
                jnp.asarray(oct_per_kf[k]), jnp.asarray(oct_per_kf[k + 1]),
            )

        # Births at kf 0->1: track A (q=1 oct 1, t=0 oct 3), B (q=2 oct 2, t=2 oct 1).
        store = one(store, 0, [(1, 0), (2, 2)])
        octs = np.asarray(store.octaves)
        used = np.nonzero(np.asarray(store.used))[0]
        per_track = {tuple(octs[t, :2]) for t in used}
        assert per_track == {(1, 3), (2, 1)}
        # Extend the track whose last feature is 0 with kf2 feature 1 (oct 5).
        store = one(store, 1, [(0, 1)])
        alive = np.nonzero(np.asarray(store.alive))[0]
        assert np.asarray(store.octaves)[alive[0], :3].tolist() == [1, 3, 5]
