"""Deterministic local mapping: the keyframe-rate map update + local BA.

Replaces the LocalMapping thread (`LocalMapping::Run`,
reference src/LocalMapping.cc:48-113) with a synchronous step invoked by the
tracker at keyframe creation:

    recent-point culling (MapPointCulling, LocalMapping.cc:171-206)
    -> local bundle adjustment (Optimizer::LocalBundleAdjustment,
       Optimizer.cc:936-1388) as batched GN + dense Schur on device
    -> outlier observation erasure (Optimizer.cc:1336-1358).

The BA window mirrors the reference: the new KF + its covisible KFs are free,
every other KF observing a window point is a fixed anchor
(Optimizer.cc:988-1018). All problem arrays are padded to fixed capacities so
the solver compiles exactly once.
"""
from __future__ import annotations

from collections import deque
from functools import partial

import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..optim import ba
from ..slammap.map_store import MapStore


class LocalMapper:
    def __init__(
        self,
        store: MapStore,
        cfg: SlamConfig,
        k_local: int = 16,
        k_fixed: int = 8,
        p_cap: int = 8192,
        o_cap: int = 24576,
        l_cap: int = 512,
        lo_cap: int = 2048,
        ba_interval: int = 1,
    ):
        self.store = store
        self.cfg = cfg
        self.cam = store.cam
        self.k_local = k_local
        self.k_fixed = k_fixed
        self.k_cap = k_local + k_fixed
        self.p_cap = p_cap
        self.o_cap = o_cap
        # size buckets: the BA grid costs O(K * P_cap) per iteration, and a
        # young map fills a fraction of the max capacity. Pad to the smallest
        # bucket that fits, growing monotonically (each bucket compiles its
        # program once; shrinking would flip-flop recompiles).
        self.p_buckets = [b for b in (1024, 2048, 4096, 8192) if b <= p_cap]
        if not self.p_buckets or self.p_buckets[-1] != p_cap:
            self.p_buckets.append(p_cap)
        self._p_bucket = self.p_buckets[0]
        self.l_cap = l_cap
        self.lo_cap = lo_cap
        self.ba_interval = ba_interval
        self.enable_lines = cfg.line.enabled
        self._recent: deque = deque(maxlen=3)  # (kf_id, created point ids)
        self._inv_sigma2 = np.power(
            1.0 / store.cfg.scale ** 2, np.arange(store.cfg.n_levels)
        ).astype(np.float32)
        self._kf_count = 0
        # invoked with the culled KF id (tracker wires KeyFrameDatabase.erase
        # here — the reference erases at KeyFrame.cc:567)
        self.on_kf_culled = None
        self.stage_times: dict[str, float] = {}

    # ------------------------------------------------------------------

    def warmup(self):
        """Pre-compile the local-BA program at every point-capacity bucket
        (the bucket grows as the map grows; each growth would otherwise pay
        a ~15-25 s remote compile mid-sequence)."""
        rng = np.random.default_rng(0)
        cam = self.cam
        K = self.k_cap
        for P in self.p_buckets:
            O = 3 * P
            poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
            pts = np.stack([rng.uniform(-5, 5, P), rng.uniform(-3, 3, P),
                            rng.uniform(8, 20, P)], -1).astype(np.float32)
            k_o = rng.integers(0, max(K // 2, 1), O).astype(np.int32)
            p_o = rng.integers(0, P, O).astype(np.int32)
            z = pts[p_o, 2]
            uvr = np.stack([cam.fx * pts[p_o, 0] / z + cam.cx,
                            cam.fy * pts[p_o, 1] / z + cam.cy,
                            cam.fx * pts[p_o, 0] / z + cam.cx - cam.bf / z],
                           -1).astype(np.float32)
            fixed = np.zeros(K, bool)
            fixed[K // 2:] = True
            problem = ba.BAProblem(
                poses=jnp.asarray(poses), points=jnp.asarray(pts),
                pose_fixed=jnp.asarray(fixed),
                point_valid=jnp.ones(P, bool),
                obs=ba.BAObs(
                    k=jnp.asarray(k_o), p=jnp.asarray(p_o),
                    uvr=jnp.asarray(uvr),
                    inv_sigma2=jnp.ones(O, jnp.float32),
                    is_stereo=jnp.ones(O, bool),
                    valid=jnp.asarray(np.arange(O) < O // 2)))
            if self.enable_lines:
                # line-enabled runs use the joint program, not the
                # points-only one: warm that executable per bucket
                from ..optim import lines_ba
                LC, LO = self.l_cap, self.lo_cap
                q = np.zeros((LC, 4), np.float32)
                q[:, 0] = 1.0
                lobs = lines_ba.LineBAObs(
                    k=jnp.zeros(LO, jnp.int32),
                    l=jnp.asarray(rng.integers(0, LC, LO).astype(np.int32)),
                    x1l=jnp.asarray(rng.uniform(50, 300, (LO, 2)).astype(np.float32)),
                    x2l=jnp.asarray(rng.uniform(50, 300, (LO, 2)).astype(np.float32)),
                    x1r=jnp.asarray(rng.uniform(50, 300, (LO, 2)).astype(np.float32)),
                    x2r=jnp.asarray(rng.uniform(50, 300, (LO, 2)).astype(np.float32)),
                    octave=jnp.zeros(LO, jnp.int32),
                    has_r=jnp.ones(LO, bool),
                    valid=jnp.asarray(np.arange(LO) < 8),
                )
                joint = lines_ba.JointProblem(
                    base=problem, q=jnp.asarray(q),
                    alpha=jnp.ones(LC, jnp.float32),
                    line_valid=jnp.asarray(np.arange(LC) < 8), lobs=lobs)
                np.asarray(lines_ba.local_joint_ba_packed(
                    cam, joint, float(self.cfg.line.gamma)))
            else:
                np.asarray(ba.local_ba_packed(cam, problem))

    def note_created(self, kf_id: int, pt_ids: np.ndarray):
        self._recent.append((kf_id, np.asarray(pt_ids)))

    def process_keyframe(self, kf_id: int):
        """The LocalMapping::Run loop body, deterministic
        (LocalMapping.cc:53-113 order: process -> cull points -> create new
        points -> fuse -> local BA -> cull keyframes)."""
        import time as _time
        t = _time.perf_counter
        s = self.store
        t0 = t()
        s.refresh_obs_counts()
        # newly created points of this KF enter the culling probation window
        new_ids = s.kf_pt_ids[kf_id][(s.kf_pt_ids[kf_id] >= 0)
                                     & (s.pt_first_kf[s.kf_pt_ids[kf_id].clip(0)] == kf_id)]
        self.note_created(kf_id, new_ids)
        # probation culling over the recent window (LocalMapping.cc:171-206)
        for src_kf, ids in list(self._recent):
            if len(ids):
                s.cull_points(ids, current_kf=kf_id)
        t1 = t()
        if s.n_kf >= 2:
            tri_ids = self.create_new_points(kf_id)
            if len(tri_ids):
                self.note_created(kf_id, tri_ids)
            t2 = t()
            self.fuse_neighbors(kf_id)
        else:
            t2 = t()
        t3 = t()
        self._kf_count += 1
        if s.n_kf >= 2 and self._kf_count % self.ba_interval == 0:
            self.local_ba(kf_id)
        t4 = t()
        self.cull_keyframes(kf_id)
        t5 = t()
        st = self.stage_times
        for k, v in (("cull_pts", t1 - t0), ("triangulate", t2 - t1),
                     ("fuse", t3 - t2), ("ba", t4 - t3), ("cull_kf", t5 - t4)):
            st[k] = st.get(k, 0.0) + v
        st["n"] = st.get("n", 0) + 1

    # ------------------------------------------------------------------

    def create_new_points(self, kf_id: int, n_neighbors: int = 10) -> np.ndarray:
        """Epipolar triangulation of unmatched features against the best
        covisible keyframes (CreateNewMapPoints, LocalMapping.cc:208-453).
        Adds the far points stereo depth cannot provide. Returns new ids."""
        import jax.numpy as jnp
        from . import mapping_ops

        s = self.store
        covis, _ = s.covisible_kfs(kf_id, min_shared=15, top=n_neighbors)
        if len(covis) == 0:
            return np.zeros(0, np.int32)
        lut = jnp.asarray(self._inv_sigma2)
        free1 = s.kf_kp_valid[kf_id] & (s.kf_pt_ids[kf_id] < 0)
        created: list[int] = []
        claimed = np.zeros(s.n_kp, bool)
        nbs = [int(nb) for nb in covis[:3]]  # best neighbors first
        n_real = len(nbs)
        # pad to a FIXED batch of 3 (self-pairs with an all-False free mask
        # match nothing): a varying batch size is a new shape -> a fresh
        # ~15 s remote compile mid-sequence
        nbs = nbs + [kf_id] * (3 - n_real)
        free2s = s.kf_kp_valid[nbs] & (s.kf_pt_ids[nbs] < 0)
        free2s[n_real:] = False
        # all neighbors in ONE batched device call; the greedy claim order
        # (a feature triangulated against the best neighbor is no longer
        # free for the next) is applied on host below, as the reference's
        # sequential neighbor loop does (LocalMapping.cc:243+).
        # Divergence (speed tradeoff): a left feature claimed by a better
        # neighbor is dropped for later neighbors rather than letting them
        # fall back to their second-best left feature, so dense-overlap
        # scenes triangulate slightly fewer points than the sequential loop.
        import time as _time
        _t0 = _time.perf_counter()
        bufs = np.asarray(mapping_ops.triangulate_pairs(
            s.cam, jnp.asarray(s.kf_pose[kf_id]),
            jnp.asarray(s.kf_xy[kf_id]), jnp.asarray(s.kf_desc[kf_id]),
            jnp.asarray(s.kf_oct[kf_id]), jnp.asarray(free1),
            jnp.asarray(s.kf_pose[nbs]), jnp.asarray(s.kf_xy[nbs]),
            jnp.asarray(s.kf_desc[nbs]), jnp.asarray(s.kf_oct[nbs]),
            jnp.asarray(free2s), lut))
        self.stage_times["tri_dev"] = self.stage_times.get("tri_dev", 0.0) \
            + (_time.perf_counter() - _t0)
        for bi, nb in enumerate(nbs[:n_real]):
            n_good, match, X = mapping_ops.unpack_triangulate_np(bufs[bi], s.n_kp)
            sel = np.nonzero((match >= 0) & ~claimed)[0]
            if len(sel) == 0:
                continue
            if s.n_pt + len(sel) > s.max_pt:
                break
            ids = s.create_points(kf_id, sel, X[sel])
            s.kf_pt_ids[nb, match[sel]] = ids  # second observation
            s.mark_obs_dirty()
            claimed[sel] = True
            created.extend(ids.tolist())
        if created:
            s.refresh_obs_counts()
        return np.asarray(created, np.int32)

    def fuse_neighbors(self, kf_id: int, n_neighbors: int = 5):
        """Duplicate-point fusion with covisible keyframes
        (SearchInNeighbors + ORBmatcher::Fuse, LocalMapping.cc:455-554):
        project the new KF's points into each neighbor; a hit on a feature
        holding another point merges the two (most-observed wins), a hit on
        a free feature adds an observation."""
        import jax.numpy as jnp
        from ..frontend import matching
        from . import mapping_ops

        s = self.store
        covis, _ = s.covisible_kfs(kf_id, min_shared=15, top=n_neighbors)
        my_pts = s.kf_pt_ids[kf_id]
        pids = np.unique(my_pts[my_pts >= 0])
        pids = pids[s.pt_valid[pids]]
        if len(pids) == 0 or len(covis) == 0:
            return
        cap = 2048
        pids = pids[-cap:]
        pad = cap - len(pids)
        view = matching.MapPointView(
            pos=jnp.asarray(np.concatenate(
                [s.pt_pos[pids], np.zeros((pad, 3), np.float32)])),
            desc=jnp.asarray(np.concatenate(
                [s.pt_desc[pids], np.zeros((pad, 8), np.uint32)])),
            normal=jnp.asarray(np.concatenate(
                [s.pt_normal[pids], np.zeros((pad, 3), np.float32)])),
            min_dist=jnp.asarray(np.concatenate(
                [s.pt_min_dist[pids], np.zeros(pad, np.float32)])),
            max_dist=jnp.asarray(np.concatenate(
                [s.pt_max_dist[pids], np.zeros(pad, np.float32)])),
            valid=jnp.asarray(np.concatenate(
                [np.ones(len(pids), bool), np.zeros(pad, bool)])),
        )
        pid_arr = np.concatenate([pids, np.full(pad, -1, np.int64)])
        nbs = [int(nb) for nb in covis[:2]]
        n_real = len(nbs)
        nbs = nbs + [kf_id] * (2 - n_real)  # fixed batch (see triangulate)
        valid2 = s.kf_kp_valid[nbs].copy()
        valid2[n_real:] = False
        feats_s = matching.FrameFeatures(
            xy=jnp.asarray(s.kf_xy[nbs]), ur=jnp.asarray(s.kf_ur[nbs]),
            octave=jnp.asarray(s.kf_oct[nbs]),
            angle=jnp.asarray(s.kf_angle[nbs]),
            desc=jnp.asarray(s.kf_desc[nbs]),
            valid=jnp.asarray(valid2))
        import time as _time
        _t0 = _time.perf_counter()
        bufs = np.asarray(mapping_ops.fuse_candidates_multi(
            s.cam, jnp.asarray(s.kf_pose[nbs]), view, feats_s,
            n_levels=s.cfg.n_levels, scale=s.cfg.scale))
        self.stage_times["fuse_dev"] = self.stage_times.get("fuse_dev", 0.0) \
            + (_time.perf_counter() - _t0)
        merged = False
        for bi, nb in enumerate(nbs[:n_real]):
            kp2pt = bufs[bi][cap:]
            hit = np.nonzero(kp2pt >= 0)[0]
            row = s.kf_pt_ids[nb]
            # MapPoint::IsInKeyFrame guard (MapPoint.cc:396): never give one
            # KF two features on the same point — duplicate (k, p) obs rows
            # make the dense BA scatter nondeterministic
            present = set(int(x) for x in row[row >= 0])
            for kp in hit:
                p = int(pid_arr[kp2pt[kp]])
                if p < 0 or not s.pt_valid[p]:
                    continue
                q = int(row[kp])
                if q == p:
                    continue
                if q < 0:
                    if p in present:
                        continue
                    row[kp] = p  # new observation
                    present.add(p)
                    s.mark_obs_dirty()
                elif s.pt_valid[q]:
                    # merge: most-observed point survives (MapPoint::Replace)
                    keep, drop = (p, q) if s.pt_nobs[p] >= s.pt_nobs[q] else (q, p)
                    K = s.n_kf
                    m = s.kf_pt_ids[:K] == drop
                    s.kf_pt_ids[:K][m] = keep
                    s.pt_valid[drop] = False
                    merged = True
                    s.mark_obs_dirty()
        if merged:
            # a merge can leave some KF observing `keep` on two features;
            # keep the first slot per (KF, point) row-wise
            K = s.n_kf
            ids = s.kf_pt_ids[:K]
            srt = np.sort(np.where(ids >= 0, ids, np.iinfo(np.int32).max), axis=1)
            has_dup = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0) \
                & (srt[:, 1:] != np.iinfo(np.int32).max)
            for k in np.nonzero(has_dup.any(axis=1))[0]:
                row = ids[k]
                seen: set[int] = set()
                for i in np.nonzero(row >= 0)[0]:
                    v = int(row[i])
                    if v in seen:
                        row[i] = -1
                    else:
                        seen.add(v)
            s.mark_obs_dirty()
        s.refresh_obs_counts()

    def cull_keyframes(self, kf_id: int):
        """Redundant-KF culling (KeyFrameCulling, LocalMapping.cc:633-759):
        a covisible KF dies when >= 90% of its tracked points are seen by
        at least 3 other keyframes. Culled KFs keep their pose (trajectory
        replay + pose-graph chains still reference it) but stop contributing
        observations."""
        s = self.store
        covis, _ = s.covisible_kfs(kf_id, min_shared=15)
        if len(covis) == 0:
            return
        K = s.n_kf
        # distinct-KF observer count per point
        obs_kf = np.zeros(s.max_pt, np.int32)
        ids = s.kf_pt_ids[:K]
        sel = ids >= 0
        np.add.at(obs_kf, ids[sel], 1)
        for k in covis:
            k = int(k)
            if k == 0 or k == kf_id or not s.kf_valid[k]:
                continue
            pts = s.kf_pt_ids[k]
            pts = pts[pts >= 0]
            if len(pts) == 0:
                continue
            redundant = (obs_kf[pts] >= 4).mean()  # 3 others + itself
            if redundant >= 0.9:
                obs_kf[pts] -= 1
                s.kf_pt_ids[k] = -1
                s.kf_ln_ids[k] = -1  # divergence from D7: detach line obs too
                s.kf_valid[k] = False
                s.reparent_children(k)
                s.mark_obs_dirty()
                if self.on_kf_culled is not None:
                    self.on_kf_culled(k)
        s.refresh_obs_counts()

    # ------------------------------------------------------------------

    def _build_problem(self, kf_id: int):
        """Assemble the padded BAProblem for the covisibility window."""
        s = self.store
        local, fixed, local_pts = s.local_window(kf_id, max_kf=self.k_local)
        if len(fixed) > self.k_fixed:
            # keep the fixed KFs anchoring the most window observations
            counts = (np.isin(s.kf_pt_ids[fixed], local_pts)
                      & (s.kf_pt_ids[fixed] >= 0)).sum(axis=1)
            fixed = fixed[np.argsort(-counts)[: self.k_fixed]]
        if len(fixed) == 0 and len(local) > 1:
            # gauge: freeze the oldest local KF (reference fixes KF 0 via the
            # id==0 check, Optimizer.cc:1015-1017)
            fixed = local[-1:]
            local = local[:-1]
        window = np.concatenate([local, fixed]).astype(np.int32)
        n_free = len(local)
        obs_ratio = max(self.o_cap // self.p_cap, 1)
        if len(local_pts) > self.p_buckets[-1]:
            local_pts = local_pts[-self.p_buckets[-1]:]
        pts = local_pts.astype(np.int32)

        # observation table: every (window KF, feature) slot pointing into
        # pts. Fixed anchors FIRST: if the table ever exceeds the bucket, the
        # tail truncation drops free-window observations, never the anchors
        # tying the window to the global map.
        pt_lut = np.full(s.max_pt, -1, np.int32)
        pt_lut[pts] = np.arange(len(pts), dtype=np.int32)
        okf, ofe = [], []
        order = list(range(n_free, len(window))) + list(range(n_free))
        for wi in order:
            k = window[wi]
            ids_k = s.kf_pt_ids[k]
            sel = np.nonzero(pt_lut[ids_k.clip(0)] >= 0)[0]
            sel = sel[ids_k[sel] >= 0]
            # dedup: one observation per (KF, point) — fuse merges can leave
            # a KF with two features on the same point, and duplicate (k, p)
            # rows make the dense scatter in ba._densify_obs nondeterministic
            _, first = np.unique(pt_lut[ids_k[sel]], return_index=True)
            sel = sel[np.sort(first)]
            okf.append(np.full(len(sel), wi, np.int32))
            ofe.append(sel.astype(np.int32))
        okf = np.concatenate(okf)
        ofe = np.concatenate(ofe)
        # grow the bucket until both the point count and the observation
        # count fit (the obs cap scales with the bucket at the configured
        # o_cap/p_cap ratio; the constructor caps stay authoritative)
        while self._p_bucket < self.p_buckets[-1] and (
                len(pts) > self._p_bucket
                or len(okf) > obs_ratio * self._p_bucket):
            self._p_bucket = self.p_buckets[
                self.p_buckets.index(self._p_bucket) + 1]
        p_bkt = self._p_bucket
        o_bkt = obs_ratio * p_bkt
        if len(pts) > p_bkt:
            pts = pts[-p_bkt:]
            pt_lut[:] = -1
            pt_lut[pts] = np.arange(len(pts), dtype=np.int32)
            keep = pt_lut[s.kf_pt_ids[window[okf], ofe]] >= 0
            okf, ofe = okf[keep], ofe[keep]
        if len(okf) > o_bkt:
            okf, ofe = okf[: o_bkt], ofe[: o_bkt]
        kf_abs = window[okf]
        p_idx = pt_lut[s.kf_pt_ids[kf_abs, ofe]]
        uv = s.kf_xy[kf_abs, ofe]
        ur = s.kf_ur[kf_abs, ofe]
        uvr = np.concatenate([uv, ur[:, None]], -1).astype(np.float32)
        inv_s2 = self._inv_sigma2[s.kf_oct[kf_abs, ofe]]
        is_st = ur >= 0

        O = len(okf)
        K, P = self.k_cap, p_bkt

        def padk(a, fill=0):
            return np.concatenate(
                [a, np.full((K - len(a),) + a.shape[1:], fill, a.dtype)])

        def pado(a, fill=0):
            return np.concatenate(
                [a, np.full((o_bkt - O,) + a.shape[1:], fill, a.dtype)])

        poses = padk(s.kf_pose[window])
        poses[len(window):] = np.eye(4, dtype=np.float32)
        pose_fixed = np.ones(K, bool)
        pose_fixed[:n_free] = False
        points = np.concatenate(
            [s.pt_pos[pts], np.zeros((P - len(pts), 3), np.float32)])
        point_valid = np.concatenate(
            [s.pt_valid[pts], np.zeros(P - len(pts), bool)])
        obs = ba.BAObs(
            k=jnp.asarray(pado(okf)),
            p=jnp.asarray(pado(p_idx)),
            uvr=jnp.asarray(pado(uvr)),
            inv_sigma2=jnp.asarray(pado(inv_s2.astype(np.float32), 1.0)),
            is_stereo=jnp.asarray(pado(is_st)),
            valid=jnp.asarray(pado(np.ones(O, bool))),
        )
        problem = ba.BAProblem(
            poses=jnp.asarray(poses),
            points=jnp.asarray(points),
            pose_fixed=jnp.asarray(pose_fixed),
            point_valid=jnp.asarray(point_valid),
            obs=obs,
        )
        meta = dict(window=window, n_free=n_free, pts=pts, p_bkt=p_bkt,
                    okf=okf, ofe=ofe, kf_abs=kf_abs, p_idx=p_idx, n_obs=O)
        return problem, meta

    def _build_line_obs(self, window):
        """Line half of the BA window: lines seen by window KFs + padded
        observation table (lines_ba.LineBAObs)."""
        import jax.numpy as jnp
        from ..geometry import lines as glines
        from ..optim import lines_ba

        s = self.store
        lids = np.unique(s.kf_ln_ids[window])
        lids = lids[lids >= 0]
        lids = lids[s.ln_valid[lids]][-self.l_cap:]
        L = len(lids)
        ln_lut = np.full(s.max_ln, -1, np.int32)
        ln_lut[lids] = np.arange(L, dtype=np.int32)
        mask = (s.kf_ln_ids[window] >= 0) \
            & (ln_lut[s.kf_ln_ids[window].clip(0)] >= 0)
        wk, wd = np.nonzero(mask)
        # dedup (KF, line) pairs — duplicate rows break the dense scatter
        # in lines_ba the same way duplicate point obs break ba
        _, first = np.unique(
            wk.astype(np.int64) * s.max_ln + s.kf_ln_ids[window[wk], wd],
            return_index=True)
        wk, wd = wk[np.sort(first)], wd[np.sort(first)]
        kf_abs = window[wk]
        l_idx = ln_lut[s.kf_ln_ids[kf_abs, wd]]
        O = min(len(wk), self.lo_cap)
        wk, wd, kf_abs, l_idx = wk[:O], wd[:O], kf_abs[:O], l_idx[:O]

        def pad(a, fill=0):
            out = np.full((self.lo_cap,) + a.shape[1:], fill, a.dtype)
            out[:O] = a
            return out

        lobs = lines_ba.LineBAObs(
            k=jnp.asarray(pad(wk.astype(np.int32))),
            l=jnp.asarray(pad(l_idx.astype(np.int32))),
            x1l=jnp.asarray(pad(s.kf_ln_p1[kf_abs, wd])),
            x2l=jnp.asarray(pad(s.kf_ln_p2[kf_abs, wd])),
            x1r=jnp.asarray(pad(s.kf_ln_p1r[kf_abs, wd])),
            x2r=jnp.asarray(pad(s.kf_ln_p2r[kf_abs, wd])),
            octave=jnp.asarray(pad(s.kf_ln_oct[kf_abs, wd])),
            has_r=jnp.asarray(pad(s.kf_ln_has_r[kf_abs, wd])),
            valid=jnp.asarray(np.arange(self.lo_cap) < O),
        )
        LC = self.l_cap
        x0 = np.zeros((LC, 3), np.float32)
        dr = np.tile(np.array([1, 0, 0], np.float32), (LC, 1))
        x0[:L] = s.ln_x0[lids]
        dr[:L] = s.ln_dir[lids]
        q, alpha = glines.minimal_from_x0dir(jnp.asarray(x0), jnp.asarray(dr))
        line_valid = np.zeros(LC, bool)
        line_valid[:L] = True
        meta = dict(lids=lids, kf_abs=kf_abs, wd=wd, n_lobs=O)
        return q, alpha, jnp.asarray(line_valid), lobs, meta

    def local_ba(self, kf_id: int):
        """Run the windowed BA and write results back into the store."""
        s = self.store
        problem, meta = self._build_problem(kf_id)
        if meta["n_obs"] < 30 or len(meta["pts"]) == 0:
            return
        if self.enable_lines:
            self._local_ba_joint(problem, meta)
            return
        import time as _time
        _t0 = _time.perf_counter()
        buf = np.asarray(ba.local_ba_packed(self.cam, problem))
        self.stage_times["ba_dev"] = self.stage_times.get("ba_dev", 0.0) \
            + (_time.perf_counter() - _t0)
        poses, points, keep = ba.unpack_local_ba_np(
            buf, self.k_cap, meta["p_bkt"])

        window, n_free, pts = meta["window"], meta["n_free"], meta["pts"]
        s.kf_pose[window[:n_free]] = poses[:n_free]
        s.pt_pos[pts] = points[: len(pts)]
        # erase outlier observations (Optimizer.cc:1336-1358)
        O = meta["n_obs"]
        bad = ~keep[:O]
        if bad.any():
            s.kf_pt_ids[meta["kf_abs"][bad], meta["ofe"][bad]] = -1
            s.mark_obs_dirty()
            # points that lost every observation die
            dead_cand = np.unique(pts[np.unique(meta["p_idx"][:O][bad])])
            if len(dead_cand):
                s.refresh_obs_counts()
                s.remove_points(dead_cand[s.pt_nobs[dead_cand] == 0])

    def _local_ba_joint(self, problem, meta):
        """Joint point+line window BA (lines_ba.local_joint_ba) writeback."""
        from ..geometry import lines as glines
        from ..optim import lines_ba
        import jax.numpy as jnp

        s = self.store
        window, n_free, pts = meta["window"], meta["n_free"], meta["pts"]
        q, alpha, line_valid, lobs, lmeta = self._build_line_obs(window)
        joint = lines_ba.JointProblem(
            base=problem, q=q, alpha=alpha, line_valid=line_valid, lobs=lobs)
        gamma = float(self.cfg.line.gamma)
        buf = np.asarray(lines_ba.local_joint_ba_packed(
            self.cam, joint, gamma))
        poses, points, q2, a2, keep_p, keep_l = lines_ba.unpack_local_joint_np(
            buf, self.k_cap, meta["p_bkt"], self.l_cap, 3 * meta["p_bkt"])

        s.kf_pose[window[:n_free]] = poses[:n_free]
        s.pt_pos[pts] = points[: len(pts)]
        lids = lmeta["lids"]
        if len(lids):
            X0, d = glines.x0dir_from_minimal(jnp.asarray(q2), jnp.asarray(a2))
            X0 = np.asarray(X0)[: len(lids)]
            d = np.asarray(d)[: len(lids)]
            fin = np.isfinite(X0).all(-1) & np.isfinite(d).all(-1)
            s.ln_x0[lids[fin]] = X0[fin]
            s.ln_dir[lids[fin]] = d[fin]
        # outlier erasure, both classes
        O = meta["n_obs"]
        bad = ~keep_p[:O]
        if bad.any():
            s.kf_pt_ids[meta["kf_abs"][bad], meta["ofe"][bad]] = -1
            s.mark_obs_dirty()
            dead_cand = np.unique(pts[np.unique(meta["p_idx"][:O][bad])])
            if len(dead_cand):
                s.refresh_obs_counts()
                s.remove_points(dead_cand[s.pt_nobs[dead_cand] == 0])
        Ol = lmeta["n_lobs"]
        badl = ~keep_l[:Ol]
        if badl.any():
            s.kf_ln_ids[lmeta["kf_abs"][badl], lmeta["wd"][badl]] = -1
