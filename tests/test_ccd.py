"""Swept-CCD activation tests (round-3 learning-regression fix).

The round-2 speculative activation (``dist + vn*dt < 0`` on the closest-point
distance) fired PHANTOM contacts on near-misses past geom edges, deflecting
the ball sideways and inverting the C7 alignment-reward gradient. The fix
samples the actual closest-point distance along the relative sweep
(ops.contacts.swept_frame): edge passes stay contact-free, while genuinely
crossing trajectories (thin paddle at C6-class speeds) still activate.
"""

import numpy as np
import jax.numpy as jnp

from isaacgym_tpu.ops import contacts as C

DT = 1.0 / 120.0 / 2.0  # reference tilt-family substep


def _box_fn(half, radius):
    box_pos = jnp.zeros(3)
    box_quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    return lambda p: C.sphere_box(p, radius, box_pos, box_quat, jnp.asarray(half))


def test_edge_pass_no_phantom_contact():
    """Ball passing BESIDE a thin slab edge must not be deflected, even when
    it moves toward the slab's closest point (the round-2 phantom-contact
    regression: this exact case fired and punished near-misses)."""
    radius = 0.02
    fn = _box_fn([0.1, 0.1, 0.0075], radius)   # paddle-blade-like slab
    vel = jnp.asarray([0.0, 0.0, -8.0])
    # x = 0.13 > half_x + radius: a clean lateral miss by 1 cm
    for z in np.linspace(0.15, -0.15, 40):
        pos = jnp.asarray([0.13, 0.0, float(z)])
        frame, now_dist = C.swept_frame(fn, pos, vel, DT)
        dv, dw, _, active = C.resolve_sphere_impulse_spin(
            vel, jnp.zeros(3), radius, 1.5, frame, jnp.zeros(3),
            restitution=1.05, friction=0.2)
        assert not bool(active), f"phantom contact at z={z}"
        np.testing.assert_array_equal(np.asarray(dv), 0.0)


def test_fast_crossing_still_caught():
    """C6-class approach speed vs the thin blade: the per-substep motion
    exceeds the penetration window, so penetration-only activation misses
    the crossing on some start offsets; the swept sweep must catch ALL."""
    radius = 0.02
    half_t = 0.0075
    fn = _box_fn([0.1, 0.1, half_t], radius)
    speed = 14.0                                 # ball + swing, m/s
    step = speed * DT                            # 58 mm/substep
    window = 2 * (radius + half_t)               # 55 mm full crossing window
    assert step > window                         # genuinely tunnel-prone
    vel = jnp.asarray([0.0, 0.0, -speed])
    for z0 in np.linspace(radius + half_t + 1e-4,
                          radius + half_t + step, 25):
        z, caught = float(z0), False
        while z > -(radius + half_t):   # until fully past the blade
            frame, _ = C.swept_frame(fn, jnp.asarray([0.0, 0.0, z]), vel, DT)
            vn = float(jnp.sum(vel * frame.normal))
            if (float(frame.dist) < 0.0) and (vn < 0.0):
                caught = True
                break
            z -= step
        assert caught, f"swept CCD let the ball tunnel from z0={z0}"


def test_resting_contact_unchanged():
    """Slow/penetrating contacts behave exactly like penetration-only."""
    radius = 0.02
    fn = _box_fn([0.1, 0.1, 0.0075], radius)
    pos = jnp.asarray([0.0, 0.0, 0.0075 + radius - 0.001])  # 1 mm penetration
    vel = jnp.asarray([0.0, 0.0, -0.1])
    frame, now_dist = C.swept_frame(fn, pos, vel, DT)
    base = fn(pos)
    assert float(now_dist) == float(base.dist)
    dv, dw, _, active = C.resolve_sphere_impulse_spin(
        vel, jnp.zeros(3), radius, 1.5, frame, jnp.zeros(3),
        restitution=1.05, friction=0.2, bounce_threshold=0.2)
    assert bool(active)
    # below bounce threshold: inelastic stop, no restitution
    np.testing.assert_allclose(np.asarray(dv)[2], 0.1, atol=1e-6)


def test_env_ball_approach_unchanged_by_sweep():
    """The C7 ball's nominal flight matches the penetration-only trajectory
    to within one-substep bounce-timing skew (no phantom deflections; the
    sweep may legally fire a genuine bounce one substep early)."""
    import isaacgym_tpu

    def roll(ccd):
        import os
        os.environ["ISAACGYM_TPU_CCD"] = ccd
        try:
            env = isaacgym_tpu.make(
                seed=11, task="HumanoidPingpongTiltNoEarlyStopG1",
                num_envs=4, episodeLength=60)
            state, obs = env.reset()
            out = []
            for _ in range(40):
                state, obs, rew, done, info = env.step(
                    state, jnp.zeros((4, 7)))
                out.append(np.asarray(state.sim.root[:, env.ball_actor, 0:3]))
            return np.stack(out)
        finally:
            os.environ.pop("ISAACGYM_TPU_CCD", None)

    swept = roll("1")
    pen_only = roll("0")
    # pre-bounce flight identical; post-bounce allows the 1-substep skew
    np.testing.assert_allclose(swept[:5], pen_only[:5], atol=1e-5)
    assert float(np.abs(swept - pen_only).max()) < 0.12
