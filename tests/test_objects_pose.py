import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_lidar_tpu import configs
from nerf_lidar_tpu.models import objects as objlib
from nerf_lidar_tpu.models import posenet as pn
from nerf_lidar_tpu.models.model import Model
from nerf_lidar_tpu.train import train_step


def test_so3_exp_is_rotation_and_matches_small_angle():
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    R = pn.so3_exp(r)
    RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    # Small-angle: R ~ I + skew(r).
    r_small = jnp.asarray([[1e-4, -2e-4, 3e-4]])
    R_small = np.asarray(pn.so3_exp(r_small))[0]
    want = np.eye(3) + np.asarray(pn.vec2skew(r_small))[0]
    np.testing.assert_allclose(R_small, want, atol=1e-7)


def test_learnpose_zero_init_is_identity():
    model = pn.LearnPose(num_cams=4, num_lidars=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(3, jnp.int32))
    R, t = model.apply(params, jnp.asarray([0, 2, 4]))
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (3, 1, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0)
    # apply_pose_refinement with identity leaves the batch unchanged.
    batch = {"origins": jnp.ones((3, 3)), "directions": jnp.ones((3, 3)),
             "viewdirs": jnp.ones((3, 3)), "base_x": jnp.ones((3, 3)),
             "base_y": jnp.ones((3, 3))}
    out = pn.apply_pose_refinement(R, t, batch)
    for k in batch:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(batch[k]),
                                   atol=1e-6)


def test_trackopt_applies_deltas():
    tracks = jnp.asarray(np.random.RandomState(0).rand(2, 5, 9)
                         .astype(np.float32))
    model = pn.TrackOpt(num_objects=2, num_timestamps=5)
    params = model.init(jax.random.PRNGKey(0), tracks)
    out = model.apply(params, tracks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tracks))
    params = jax.tree.map(lambda p: p + 0.1, params)
    out2 = model.apply(params, tracks)
    np.testing.assert_allclose(np.asarray(out2[:, :, :3]),
                               np.asarray(tracks[:, :, :3]) + 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2[:, :, 4:]),
                               np.asarray(tracks[:, :, 4:]), atol=1e-6)


def test_world2object_roundtrip():
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    center = jnp.asarray([1.0, -2.0, 0.5])
    theta = jnp.asarray(0.7)
    wlh = jnp.asarray([2.0, 4.0, 1.5])
    pts_o, dirs_o = objlib.world2object(pts, dirs, center, theta, wlh)
    pts_back, dirs_back = objlib.object2world(pts_o, dirs_o, center, theta,
                                              wlh)
    np.testing.assert_allclose(np.asarray(pts_back), np.asarray(pts),
                               rtol=1e-4, atol=1e-4)
    dn = np.asarray(dirs) / np.linalg.norm(dirs, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(dirs_back), dn, atol=1e-4)
    # The box center maps to the origin; a box corner maps to (+-1)^3.
    corner = center + objlib.rotate_z(wlh / 2.0, -theta)
    c_o, _ = objlib.world2object(corner, dirs[:1], center, theta, wlh)
    np.testing.assert_allclose(np.asarray(c_o), 1.0, atol=1e-4)


def test_box_pts_intersection():
    # A point inside the box and one outside.
    pts = jnp.asarray([[[0.5, 0.0, 0.2], [5.0, 5.0, 5.0]]])  # [1, 2, 3]
    viewdirs = jnp.asarray([[1.0, 0.0, 0.0]])
    # One object at origin, 2x2x2 box, no rotation; one degenerate (wlh=0).
    obj_pose = jnp.asarray([[[0, 0, 0, 0, 2, 2, 2, 0, 0],
                             [0, 0, 0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    pts_o, dirs_o, inter = objlib.box_pts(pts, viewdirs, obj_pose)
    inter = np.asarray(inter)
    assert inter.shape == (1, 2, 2)
    assert inter[0, 0, 0] and not inter[0, 1, 0]
    assert not inter[:, :, 1].any()  # zero-size box never intersects


def test_ray_box_intersection_hits():
    ray_o = jnp.asarray([[-5.0, 0, 0], [-5.0, 3.0, 0]])
    ray_d = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]])
    t_near, t_far, hit = objlib.ray_box_intersection(ray_o, ray_d)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(t_near[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(t_far[0]), 6.0, atol=1e-5)


def test_get_pose_interpolates_linearly():
    # One object, timestamps 0..4, center moving along +x.
    T = 5
    tracks = np.zeros((1, T, 9), np.float32)
    tracks[0, :, 0] = np.arange(T)  # cx = t
    tracks[0, :, -2] = np.arange(T)  # time
    tracks[0, :, 4:7] = 1.0
    time = jnp.asarray([0.5, 2.25, 10.0])
    pose = objlib.get_pose(time, jnp.asarray(tracks))
    assert pose.shape == (3, 1, 9)
    np.testing.assert_allclose(float(pose[0, 0, 0]), 0.5, atol=1e-5)
    np.testing.assert_allclose(float(pose[1, 0, 0]), 2.25, atol=1e-5)
    # Out of range clamps to the last pose.
    np.testing.assert_allclose(float(pose[2, 0, 0]), 4.0, atol=1e-4)


def _obj_model_setup():
    cfg = configs.tiny_debug()
    obj_grid = configs.GridConfig(level_dim=2, base_resolution=4,
                                  desired_resolution=16,
                                  log2_hashmap_size=8)
    mcfg = dataclasses.replace(
        cfg.model, instance_obj=True, num_objects=2, latent_size=8,
        obj_mlp=dataclasses.replace(cfg.model.obj_mlp, grid=obj_grid,
                                    latent_size=8, class_num=5,
                                    class_type=3))
    cfg = dataclasses.replace(cfg, model=mcfg, track_refine=True)
    model = Model(mcfg)
    # Tracks: two objects sitting on the ray path.
    T = 4
    tracks = np.zeros((2, T, 9), np.float32)
    tracks[:, :, :3] = np.array([[1.0, 0, 0], [2.0, 0.5, 0]])[:, None]
    tracks[:, :, 4:7] = 0.8
    tracks[:, :, -2] = np.arange(T)
    track_mask = np.array([True, True])
    return cfg, model, jnp.asarray(tracks), jnp.asarray(track_mask)


def _batch_through_origin(R=8):
    d = np.tile([1.0, 0.0, 0.0], (R, 1)).astype(np.float32)
    bx = np.tile([0.0, 1.0, 0.0], (R, 1)).astype(np.float32)
    by = np.tile([0.0, 0.0, 1.0], (R, 1)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in dict(
        origins=np.zeros((R, 3), np.float32), directions=d, viewdirs=d,
        base_x=bx, base_y=by,
        radii=np.full((R, 1), 1e-3, np.float32),
        near=np.full((R, 1), 0.2, np.float32),
        far=np.full((R, 1), 6.0, np.float32),
        timestamp=np.linspace(0, 3, R).astype(np.float32)).items()}


@pytest.mark.slow
def test_model_with_objects_forward_and_latent_grads():
    cfg, model, tracks, track_mask = _obj_model_setup()
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    renderings, ray_history = model.apply(
        params, None, batch, tracks=tracks, track_mask=track_mask)
    assert "obj_mask" in renderings[-1]
    # Rays along +x through boxes at x=1, x=2 must intersect.
    assert bool(renderings[-1]["obj_mask"].any())

    def loss(p):
        r, _ = model.apply(p, jax.random.PRNGKey(1), batch, tracks=tracks,
                           track_mask=track_mask)
        return (r[-1]["rgb"] ** 2).mean()

    grads = jax.grad(loss)(params)
    g_lat = np.asarray(grads["params"]["obj_latents"])
    g_obj = jax.tree.map(lambda x: float(jnp.abs(x).sum()),
                         grads["params"]["obj_mlp"])
    assert np.abs(g_lat).sum() > 0
    assert sum(jax.tree.leaves(g_obj)) > 0


def test_composite_winner_matches_where_chain():
    # The winner-gather compositing must reproduce the sequential
    # "last intersecting object wins" where-chain it replaced.
    cfg, model, tracks, track_mask = _obj_model_setup()
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    R, S = 6, 5
    rng = np.random.RandomState(2)
    pts_w = jnp.asarray(rng.randn(R, S, 3).astype(np.float32) * 1.5)
    viewdirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    # Overlapping boxes so several samples intersect BOTH objects.
    obj_pose = jnp.asarray(np.tile(
        np.array([[0, 0, 0, 0.3, 2.0, 2.0, 2.0, 0, 0],
                  [0.3, 0, 0, 0.0, 2.0, 2.0, 2.0, 0, 1]], np.float32),
        (R, 1, 1)))
    base = dict(
        density=jnp.asarray(rng.rand(R, S).astype(np.float32)),
        rgb=jnp.asarray(rng.rand(R, S, 3).astype(np.float32)),
        semantic=jnp.asarray(rng.rand(R, S, 5).astype(np.float32)),
        intensity=None)

    def obj_fn(p, s, viewdirs=None, latent=None):
        return model.apply(params, p, s, viewdirs, latent,
                           method=lambda m, a, b, c, d: m.obj_mlp(
                               a, b, viewdirs=c, latent=d))

    lat = params["params"]["obj_latents"]
    got = objlib.composite_objects(obj_fn, lat, pts_w, viewdirs, obj_pose,
                                   jnp.asarray(track_mask), base,
                                   is_prop=False)
    assert np.asarray(got["obj_mask"]).sum() > 0, "test needs intersections"
    # Oracle: the round-1 sequential where-chain over the same dense outs.
    pts_o, dirs_o, inter = objlib.box_pts(pts_w, viewdirs, obj_pose)
    inter = np.asarray(inter & track_mask[None, None, :])
    assert (inter.sum(-1) > 1).any(), "test needs OVERLAPPING boxes"
    outs = objlib._eval_obj_mlp(obj_fn, lat, pts_o, dirs_o)
    for key in ("density", "rgb", "semantic"):
        merged = np.asarray(base[key])
        ov = np.asarray(outs[key])
        for o in range(2):
            m = inter[:, :, o]
            mm = m if merged.ndim == 2 else m[..., None]
            merged = np.where(mm, ov[:, :, o], merged)
        np.testing.assert_allclose(np.asarray(got[key]), merged,
                                   rtol=1e-5, atol=1e-6)


def test_compact_budget_matches_dense_winner_only():
    """sample_budget >= R*S makes the compacted path EXACTLY the dense
    winner-only path (same winner points, same MLP eval, same where); a
    small budget drops overflow samples back to the base prediction."""
    cfg, model, tracks, track_mask = _obj_model_setup()
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    R, S = 6, 24
    rng = np.random.RandomState(2)
    pts_w = jnp.asarray(rng.randn(R, S, 3).astype(np.float32) * 1.0)
    viewdirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    obj_pose = jnp.asarray(np.tile(
        np.array([[0, 0, 0, 0.3, 2.5, 2.5, 2.5, 0, 0],
                  [0.3, 0, 0, 0.0, 2.5, 2.5, 2.5, 0, 1]], np.float32),
        (R, 1, 1)))
    base = dict(
        density=jnp.asarray(rng.rand(R, S).astype(np.float32)),
        rgb=jnp.asarray(rng.rand(R, S, 3).astype(np.float32)),
        semantic=jnp.asarray(rng.rand(R, S, 5).astype(np.float32)),
        intensity=None)

    def obj_fn(p, s, viewdirs=None, latent=None):
        return model.apply(params, p, s, viewdirs, latent,
                           method=lambda m, a, b, c, d: m.obj_mlp(
                               a, b, viewdirs=c, latent=d))

    lat = params["params"]["obj_latents"]
    kw = dict(is_prop=False, sym=True, obj_sem_ids=(3, 255))
    dense = objlib.composite_objects(
        obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, **kw)
    compact = objlib.composite_objects(
        obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, sample_budget=R * S, **kw)
    for key in ("density", "rgb", "semantic"):
        np.testing.assert_allclose(np.asarray(compact[key]),
                                   np.asarray(dense[key]),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(compact["loss_sym"]),
                               float(dense["loss_sym"]), rtol=1e-5)

    # Tiny budget: the first 8 intersecting samples (row-major order) match
    # the dense output; overflow samples keep the base field prediction.
    small = objlib.composite_objects(
        obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, sample_budget=8, is_prop=False)
    flag = np.asarray(dense["obj_mask"]).any(-1).reshape(-1)
    pos = np.cumsum(flag) - 1
    assert flag.sum() > 8, "test needs overflow"
    for key in ("density", "rgb"):
        got = np.asarray(small[key]).reshape((R * S,) + np.asarray(
            small[key]).shape[2:])
        want_d = np.asarray(dense[key]).reshape(got.shape)
        want_b = np.asarray(base[key]).reshape(got.shape)
        kept = flag & (pos < 8)
        dropped = flag & (pos >= 8)
        np.testing.assert_allclose(got[kept], want_d[kept],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[dropped], want_b[dropped])


def test_compact_budget_matches_dense_per_class():
    """Per-class dispatch through the compacted path must agree with the
    dense grouped path wherever the winner's output is composited."""
    cfg, model, tracks, track_mask = _obj_model_setup()
    mcfg = dataclasses.replace(model.cfg, obj_class_ids=(1, 2))
    model_pc = Model(mcfg)
    batch = _batch_through_origin()
    params = model_pc.init(jax.random.PRNGKey(0), None, batch,
                           tracks=tracks, track_mask=track_mask)
    R, S = 6, 5
    rng = np.random.RandomState(3)
    pts_w = jnp.asarray(rng.randn(R, S, 3).astype(np.float32) * 1.5)
    viewdirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    obj_pose = jnp.asarray(np.tile(
        np.array([[0, 0, 0, 0.3, 2.0, 2.0, 2.0, 0, 0],
                  [0.3, 0, 0, 0.0, 2.0, 2.0, 2.0, 0, 1]], np.float32),
        (R, 1, 1)))
    base = dict(
        density=jnp.asarray(rng.rand(R, S).astype(np.float32)),
        rgb=jnp.asarray(rng.rand(R, S, 3).astype(np.float32)),
        semantic=None, intensity=None)

    def mk_obj_fn(name):
        def obj_fn(p, s, viewdirs=None, latent=None):
            return model_pc.apply(
                params, p, s, viewdirs, latent,
                method=lambda m, a, b, c, d: m.obj_mlps[
                    int(name)](a, b, viewdirs=c, latent=d))
        return obj_fn

    groups = [(mk_obj_fn(1), (0,)), (mk_obj_fn(2), (1,))]
    lat = params["params"]["obj_latents"]
    dense = objlib.composite_objects(
        None, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, is_prop=False, class_groups=groups)
    compact = objlib.composite_objects(
        None, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, is_prop=False, class_groups=groups, sample_budget=R * S)
    for key in ("density", "rgb"):
        np.testing.assert_allclose(np.asarray(compact[key]),
                                   np.asarray(dense[key]),
                                   rtol=1e-5, atol=1e-6)


def test_symmetry_loss_and_grads():
    cfg, model, tracks, track_mask = _obj_model_setup()
    mcfg = dataclasses.replace(model.cfg, symmetrize=True)
    model = Model(mcfg)
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    renderings, _ = model.apply(params, None, batch, train=True,
                                tracks=tracks, track_mask=track_mask)
    ls = renderings[-1]["loss_sym"]
    assert np.isfinite(float(ls)) and float(ls) >= 0
    # Eval mode (train=False) must not pay for or emit the sym branch.
    r_eval, _ = model.apply(params, None, batch, tracks=tracks,
                            track_mask=track_mask)
    assert "loss_sym" not in r_eval[-1]

    # Gradients flow ONLY through the mirrored branch into the obj MLP.
    def loss(p):
        r, _ = model.apply(p, None, batch, train=True, tracks=tracks,
                           track_mask=track_mask)
        return r[-1]["loss_sym"]

    grads = jax.grad(loss)(params)
    g_obj = sum(jax.tree.leaves(jax.tree.map(
        lambda x: float(jnp.abs(x).sum()), grads["params"]["obj_mlp"])))
    g_nerf = sum(jax.tree.leaves(jax.tree.map(
        lambda x: float(jnp.abs(x).sum()), grads["params"]["nerf_mlp"])))
    assert g_obj > 0
    assert g_nerf == 0


def test_sym_loss_gated_by_sym_start():
    from nerf_lidar_tpu.train import losses as losses_lib
    cfg, model, tracks, track_mask = _obj_model_setup()
    cfg = dataclasses.replace(
        cfg, sym_start=10, sym_loss=2.0,
        model=dataclasses.replace(cfg.model, symmetrize=True))
    model = Model(cfg.model)
    batch = _batch_through_origin()
    batch.update({k: jnp.asarray(v) for k, v in dict(
        rgb=np.random.RandomState(0).rand(8, 3).astype(np.float32),
        rgb_mask=np.ones(8, bool)).items()})
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    renderings, ray_history = model.apply(
        params, None, batch, train=True, tracks=tracks,
        track_mask=track_mask)
    cfg_min = dataclasses.replace(cfg, depth_loss=False,
                                  hash_decay_mults=0.0)
    before = losses_lib.compute_losses(params, batch, renderings,
                                       ray_history, cfg_min, step=5)
    after = losses_lib.compute_losses(params, batch, renderings,
                                      ray_history, cfg_min, step=11)
    assert float(before["sym"]) == 0.0
    assert float(after["sym"]) == 2.0 * float(renderings[-1]["loss_sym"])


def test_composite_scales_to_nobj16():
    cfg, model, _, _ = _obj_model_setup()
    mcfg = dataclasses.replace(model.cfg, num_objects=16)
    model = Model(mcfg)
    N, T = 16, 3
    tracks = np.zeros((N, T, 9), np.float32)
    tracks[:, :, 0] = np.linspace(0.5, 5.5, N)[:, None]
    tracks[:, :, 4:7] = 0.5
    tracks[:, :, -2] = np.arange(T)
    track_mask = np.ones(N, bool)
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch,
                        tracks=jnp.asarray(tracks),
                        track_mask=jnp.asarray(track_mask))
    renderings, _ = jax.jit(
        lambda p, b, tr, tm: model.apply(p, None, b, tracks=tr,
                                         track_mask=tm))(
        params, batch, jnp.asarray(tracks), jnp.asarray(track_mask))
    assert renderings[-1]["rgb"].shape == (8, 3)
    assert np.isfinite(np.asarray(renderings[-1]["rgb"])).all()
    assert bool(renderings[-1]["obj_mask"].any())


def test_per_class_obj_mlps_and_transplant(tmp_path):
    from nerf_lidar_tpu.train import checkpoints as ckpt_lib
    cfg, model, tracks, track_mask = _obj_model_setup()
    mcfg = dataclasses.replace(model.cfg, obj_class_ids=(0, 2))
    model = Model(mcfg)
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    # One MLP per distinct class, named by class id.
    assert "obj_mlp_cls0" in params["params"]
    assert "obj_mlp_cls2" in params["params"]
    assert "obj_mlp" not in params["params"]
    renderings, _ = model.apply(params, None, batch, tracks=tracks,
                                track_mask=track_mask)
    assert bool(renderings[-1]["obj_mask"].any())
    assert np.isfinite(np.asarray(renderings[-1]["rgb"])).all()

    # Each class MLP gets gradients only from its own slots: zero out
    # the intersection of slot 1 (class 2) by shrinking its box.
    def loss(p, tr):
        r, _ = model.apply(p, None, batch, tracks=tr,
                           track_mask=track_mask)
        return (r[-1]["rgb"] ** 2).mean()

    tracks_no1 = np.asarray(tracks).copy()
    tracks_no1[1, :, 4:7] = 0.0  # slot 1 box vanishes
    g = jax.grad(loss)(params, jnp.asarray(tracks_no1))
    g2 = sum(jax.tree.leaves(jax.tree.map(
        lambda x: float(jnp.abs(x).sum()),
        g["params"]["obj_mlp_cls2"])))
    g0 = sum(jax.tree.leaves(jax.tree.map(
        lambda x: float(jnp.abs(x).sum()),
        g["params"]["obj_mlp_cls0"])))
    assert g0 > 0
    assert g2 == 0.0

    # Transplant: save class-2's subtree, restore into a fresh init.
    path = str(tmp_path / "cls2.ckpt")
    ckpt_lib.save_obj_mlp_params(params, "obj_mlp_cls2", path)
    params_b = model.init(jax.random.PRNGKey(9), None, batch, tracks=tracks,
                          track_mask=track_mask)
    params_c = ckpt_lib.restore_obj_mlp_params(params_b, "obj_mlp_cls2",
                                               path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        params["params"]["obj_mlp_cls2"], params_c["params"]["obj_mlp_cls2"])
    # Untouched subtrees keep the fresh init.
    a0 = jax.tree.leaves(params_b["params"]["obj_mlp_cls0"])[0]
    c0 = jax.tree.leaves(params_c["params"]["obj_mlp_cls0"])[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(c0))


def test_per_class_matches_shared_when_same_params():
    # With every slot in ONE class group, grouped eval must equal the
    # shared-MLP path exactly.
    cfg, model, tracks, track_mask = _obj_model_setup()
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    r_shared, _ = model.apply(params, None, batch, tracks=tracks,
                              track_mask=track_mask)

    mcfg = dataclasses.replace(model.cfg, obj_class_ids=(1, 1))
    model_pc = Model(mcfg)
    # Same weights everywhere: rebuild the tree with the shared obj MLP's
    # params under the class-1 name (init RNG folds in module names, so a
    # fresh init would differ in every subtree).
    p = {k: v for k, v in params["params"].items() if k != "obj_mlp"}
    p["obj_mlp_cls1"] = params["params"]["obj_mlp"]
    params_pc = {"params": p}
    r_pc, _ = model_pc.apply(params_pc, None, batch, tracks=tracks,
                             track_mask=track_mask)
    np.testing.assert_allclose(np.asarray(r_pc[-1]["rgb"]),
                               np.asarray(r_shared[-1]["rgb"]),
                               rtol=1e-5, atol=1e-6)


def test_render_instance_orbit():
    from nerf_lidar_tpu.models import objects as objlib
    cfg, model, tracks, track_mask = _obj_model_setup()
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    frames = objlib.render_instance(model, params, track_id=0, height=16,
                                    width=16, num_views=2, num_samples=8)
    assert frames.shape == (2, 16, 16, 3)
    assert np.isfinite(frames).all()
    assert frames.min() >= -0.01 and frames.max() <= 1.01


def test_train_step_with_pose_and_track_refinement():
    cfg, model, tracks, track_mask = _obj_model_setup()
    cfg = dataclasses.replace(cfg, pose_refine=True, start_step=2,
                              end_step=10, track_start_opt=2, max_steps=20)
    batch = _batch_through_origin()
    batch["cam_idx"] = jnp.zeros((8, 1), jnp.int32)
    # Labels for losses.
    rng = np.random.RandomState(0)
    batch.update({k: jnp.asarray(v) for k, v in dict(
        rgb=rng.rand(8, 3).astype(np.float32),
        depth=rng.rand(8).astype(np.float32) * 4,
        semantic=rng.randint(0, 5, 8).astype(np.int32),
        rgb_mask=np.ones(8, bool), depth_mask=np.ones(8, bool),
        sem_mask=np.ones(8, bool), lidar_mask=np.zeros(8, bool),
        patch_mask=np.zeros(8, bool), loss_mask=np.ones(8, bool)).items()})

    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    posenet = pn.LearnPose(num_cams=4, num_lidars=1)
    pn_params = posenet.init(jax.random.PRNGKey(1), jnp.zeros(2, jnp.int32))
    tracknet = pn.TrackOpt(num_objects=2, num_timestamps=4)
    tn_params = tracknet.init(jax.random.PRNGKey(2), tracks)

    state, tx = train_step.create_train_state(cfg, params, pn_params,
                                              tn_params)
    step_fn = train_step.make_train_step(
        model, tx, cfg, donate=False, posenet_model=posenet,
        tracknet_model=tracknet)

    # Steps 1-2: before windows open -> pose/track params must stay zero.
    key = jax.random.PRNGKey(3)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batch, sub, tracks, track_mask)
    assert np.isfinite(float(stats["loss"]))
    # Compacted-obj budget observability: the overflow stat must exist
    # and be zero at tiny shapes (budget >= R*S there).
    assert int(stats["obj_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(state.params["posenet"]["params"]["r"]), 0.0)
    np.testing.assert_allclose(
        np.asarray(state.params["tracknet"]["params"]["opt_r"]), 0.0)
    # Steps 3-6: inside both windows -> pose/track params must move.
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batch, sub, tracks, track_mask)
    moved_pose = np.abs(np.asarray(
        state.params["posenet"]["params"]["r"])).sum()
    moved_track = np.abs(np.asarray(
        state.params["tracknet"]["params"]["opt_t"])).sum()
    assert moved_pose > 0
    assert moved_track > 0


def test_learnpose_learn_flags_gate_components():
    """learn_R/learn_t (reference configs.py:160-161): a disabled component
    stays identity/zero even with nonzero params, and gets no gradient."""
    model = pn.LearnPose(num_cams=3, learn_R=True, learn_t=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(1, jnp.int32))
    params = jax.tree.map(lambda x: x + 0.05, params)
    R, t = model.apply(params, jnp.arange(3))
    assert np.abs(np.asarray(t)).max() == 0.0
    assert np.abs(np.asarray(R) - np.eye(3)).max() > 1e-4

    def loss(p):
        R, t = model.apply(p, jnp.arange(3))
        return (R**2).sum() + (t**2).sum()

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["params"]["t"])).max() == 0.0
    assert np.abs(np.asarray(g["params"]["r"])).max() > 0.0

    m2 = pn.LearnPose(num_cams=3, learn_R=False, learn_t=True)
    R2, t2 = m2.apply(params, jnp.arange(3))
    np.testing.assert_allclose(np.asarray(R2),
                               np.broadcast_to(np.eye(3), (3, 3, 3)),
                               atol=1e-7)
    assert np.abs(np.asarray(t2)).max() > 0.0


def test_query_class_reference_mapping():
    # Reference obj_utils.py:498-508.
    assert objlib.query_class("vehicle.car") == 13
    assert objlib.query_class("car_fusion") == 13
    assert objlib.query_class("vehicle.truck") == 14
    assert objlib.query_class("vehicle.construction") == 14
    assert objlib.query_class("vehicle.trailer") == 14
    assert objlib.query_class("vehicle.bus.rigid") == 15
    assert objlib.query_class("human.pedestrian.adult") == 11
    assert objlib.query_class("movable_object.barrier") == 255


def test_composite_obj_sem_ids_labels_object_samples():
    """Fixed-semantic object slots must render their track's class
    (reference models.py:105-121 builds ObjMLP(class_type=query_class));
    obj_sem_ids carries the per-slot id; 255 keeps the field's output."""
    cfg, model, tracks, track_mask = _obj_model_setup()
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    R, S = 6, 5
    rng = np.random.RandomState(2)
    pts_w = jnp.asarray(rng.randn(R, S, 3).astype(np.float32) * 1.5)
    viewdirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    # Disjoint boxes: slot-0-only, slot-1, and outside samples all exist.
    obj_pose = jnp.asarray(np.tile(
        np.array([[-1.0, 0, 0, 0.3, 2.0, 2.0, 2.0, 0, 0],
                  [1.5, 0, 0, 0.0, 2.0, 2.0, 2.0, 0, 1]], np.float32),
        (R, 1, 1)))
    base = dict(
        density=jnp.asarray(rng.rand(R, S).astype(np.float32)),
        rgb=jnp.asarray(rng.rand(R, S, 3).astype(np.float32)),
        semantic=jnp.asarray(rng.rand(R, S, 5).astype(np.float32)),
        intensity=None)

    def obj_fn(p, s, viewdirs=None, latent=None):
        return model.apply(params, p, s, viewdirs, latent,
                           method=lambda m, a, b, c, d: m.obj_mlp(
                               a, b, viewdirs=c, latent=d))

    lat = params["params"]["obj_latents"]
    plain = objlib.composite_objects(
        obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, is_prop=False)
    got = objlib.composite_objects(
        obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, is_prop=False, obj_sem_ids=(3, 255))
    _, _, inter = objlib.box_pts(pts_w, viewdirs, obj_pose)
    inter = np.asarray(inter)
    sem = np.asarray(got["semantic"])
    sem_plain = np.asarray(plain["semantic"])
    slot0_only = inter[:, :, 0] & ~inter[:, :, 1]
    slot1 = inter[:, :, 1]  # winner (last slot wins)
    outside = ~inter.any(-1)
    assert slot0_only.any() and slot1.any() and outside.any()
    # Slot-0 wins -> one-hot(3); slot-1 wins (id 255) -> unchanged; outside
    # -> base field output.
    assert (sem[slot0_only].argmax(-1) == 3).all()
    np.testing.assert_allclose(sem[slot0_only].max(-1), 1.0)
    np.testing.assert_allclose(sem[slot1], sem_plain[slot1])
    np.testing.assert_allclose(sem[outside], np.asarray(base["semantic"])[outside])
    # Non-semantic channels are untouched by the override.
    np.testing.assert_allclose(np.asarray(got["density"]),
                               np.asarray(plain["density"]))
    # Out-of-range id (19-class car=13 against a 5-class debug head) must
    # fall back to the MLP output, not one_hot's silent all-zeros.
    oor = objlib.composite_objects(
        obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, is_prop=False, obj_sem_ids=(13, 255))
    np.testing.assert_allclose(np.asarray(oor["semantic"]),
                               np.asarray(plain["semantic"]))


def test_model_obj_sem_ids_end_to_end():
    cfg, model, tracks, track_mask = _obj_model_setup()
    mcfg = dataclasses.replace(model.cfg, obj_sem_ids=(3, 3))
    labeled = Model(mcfg)
    batch = _batch_through_origin()
    params = labeled.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                          track_mask=track_mask)
    r_lab, _ = labeled.apply(params, None, batch, tracks=tracks,
                             track_mask=track_mask)
    r_plain, _ = model.apply(params, None, batch, tracks=tracks,
                             track_mask=track_mask)
    assert bool(r_lab[-1]["obj_mask"].any())
    # The per-slot labels must change the rendered semantics on rays that
    # hit the boxes (the shared obj MLP's class_type stays 3 here, so the
    # direction of change is not asserted, only that the ids are wired).
    if "semantic" in r_lab[-1]:
        a = np.asarray(r_lab[-1]["semantic"])
        b = np.asarray(r_plain[-1]["semantic"])
        assert a.shape == b.shape


def test_eval_path_ignores_sample_budget():
    """train=False rendering must take the exact dense object path even when
    obj_sample_frac's budget would overflow at these shapes.

    Regression for the striped-sphere artifact: eval/render chunks are
    CONTIGUOUS pixels, so a chunk covered by one near object intersects far
    more than frac*R*S samples; under the budget, overflow rays fell back to
    the (object-free) field and test views rendered row-stripe holes through
    dynamic objects (exp/scale_r5q train_renders @5000). The budget is a
    train-step optimization only (random ray batches are box-sparse)."""
    cfg, model, tracks, track_mask = _obj_model_setup()
    budgeted = Model(dataclasses.replace(model.cfg, obj_sample_frac=0.01))
    dense = Model(dataclasses.replace(model.cfg, obj_sample_frac=0.0))
    batch = _batch_through_origin(R=64)
    # One big box covering most of the ray span: every ray's samples are
    # mostly in-box, the contiguous-chunk worst case.
    tracks = np.zeros((2, 4, 9), np.float32)
    tracks[:, :, 0] = 3.0          # cx
    tracks[:, :, 4:7] = 4.0        # big box
    tracks[:, :, -2] = np.arange(4)
    tracks[1, :, -1] = 1
    tracks = jnp.asarray(tracks)
    params = budgeted.init(jax.random.PRNGKey(0), None, batch,
                           tracks=tracks, track_mask=track_mask)

    # Premise: at train=True this frac DOES overflow on this batch (every
    # ray crosses both boxes), so the eval-path equality below is
    # non-vacuous.
    r_tr, _ = budgeted.apply(params, None, batch, tracks=tracks,
                             track_mask=track_mask, train=True)
    assert float(r_tr[-1]["obj_overflow"]) > 0, "premise: budget overflows"

    r_b, _ = budgeted.apply(params, None, batch, tracks=tracks,
                            track_mask=track_mask, train=False)
    r_d, _ = dense.apply(params, None, batch, tracks=tracks,
                         track_mask=track_mask, train=False)
    assert "obj_overflow" not in r_b[-1]
    for k in ("rgb", "depth", "acc"):
        if k in r_d[-1]:
            np.testing.assert_allclose(np.asarray(r_b[-1][k]),
                                       np.asarray(r_d[-1][k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


def test_obj_hit_frac_stat_measures_utilization():
    """The compacted path must report obj_hit_frac = (#intersecting
    samples)/(R*S) and obj_overflow = max(0, hits - budget) — the pair
    that sizes obj_sample_frac from data (budget floor + tripwire)."""
    cfg, model, tracks, track_mask = _obj_model_setup()
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    R, S = 6, 24
    rng = np.random.RandomState(2)
    pts_w = jnp.asarray(rng.randn(R, S, 3).astype(np.float32))
    viewdirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    obj_pose = jnp.asarray(np.tile(
        np.array([[0, 0, 0, 0.3, 2.5, 2.5, 2.5, 0, 0],
                  [0.3, 0, 0, 0.0, 2.5, 2.5, 2.5, 0, 1]], np.float32),
        (R, 1, 1)))
    base = dict(density=jnp.asarray(rng.rand(R, S).astype(np.float32)),
                rgb=jnp.asarray(rng.rand(R, S, 3).astype(np.float32)),
                semantic=None, intensity=None)

    def obj_fn(p, s, viewdirs=None, latent=None):
        return model.apply(params, p, s, viewdirs, latent,
                           method=lambda m, a, b, c, d: m.obj_mlp(
                               a, b, viewdirs=c, latent=d))

    lat = params["params"]["obj_latents"]
    dense = objlib.composite_objects(
        obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
        base, is_prop=False)
    hits = int(np.asarray(dense["obj_mask"]).any(-1).sum())
    for budget in (8, R * S):
        out = objlib.composite_objects(
            obj_fn, lat, pts_w, viewdirs, obj_pose, jnp.asarray(track_mask),
            base, is_prop=False, sample_budget=budget)
        assert float(out["obj_hit_frac"]) == pytest.approx(hits / (R * S))
        assert int(out["obj_overflow"]) == max(0, hits - budget)


def test_spectral_obj_field_composites_and_track_grads():
    """configs.spectral_obj_variant: the per-object field on the
    dense+Fourier encoder (ops/fourier.py) instead of a hashed grid. The
    forward must composite like the hashed obj field, and track gradients
    (what track refinement optimizes, reference train.py:244-268) must
    flow through the Fourier encode + compacted train path — the matmul
    alternative to the hash input-grad replay."""
    cfg, _, tracks, track_mask = _obj_model_setup()
    cfg = configs.spectral_obj_variant(cfg)
    og = dataclasses.replace(cfg.model.obj_mlp.grid, fourier_freqs=8,
                             fourier_dense_res=8, desired_resolution=16)
    mcfg = dataclasses.replace(
        cfg.model, obj_mlp=dataclasses.replace(cfg.model.obj_mlp, grid=og))
    model = Model(mcfg)
    batch = _batch_through_origin()
    params = model.init(jax.random.PRNGKey(0), None, batch, tracks=tracks,
                        track_mask=track_mask)
    renderings, _ = model.apply(params, None, batch, train=True,
                                tracks=tracks, track_mask=track_mask)
    assert bool(renderings[-1]["obj_mask"].any())

    def loss(tr):
        r, _ = model.apply(params, None, batch, train=True, tracks=tr,
                           track_mask=track_mask)
        return (r[-1]["rgb"] ** 2).mean()

    g = np.asarray(jax.grad(loss)(tracks))
    assert np.isfinite(g).all()
    # Box centers/yaw receive gradient through the spectral encode.
    assert np.abs(g[:, :, :4]).max() > 0
