import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

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
