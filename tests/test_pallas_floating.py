"""Numerical parity of the floating-base fused substep kernel (C10 class)
vs the vmapped XLA path (interpret mode on CPU; compiles on TPU).

The XLA path (ops.dynamics.forward_dynamics + Simulator._substep) is the
oracle: same formulation (u = [omega, v, qdot], Jacobian-assembled mass
matrix, jvp/RNEA bias), so trajectories must agree to f32 accumulation
noise over tens of substeps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import isaacgym_tpu


@pytest.fixture(scope="module")
def c10():
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNESSparse27DOFG1",
                            num_envs=128, episodeLength=30)
    sim = env.sim
    sim._maybe_build_pallas(force=True)
    return env, sim


def test_floating_kernel_built(c10):
    env, sim = c10
    assert sim._fused_floating is not None
    assert sim.scene.articulations[0].model.floating


def test_floating_fused_matches_xla(c10):
    """Free fall + PD hold + ball approach: fused == XLA over 20 steps."""
    env, sim = c10
    B = 128
    state0 = sim.initial_state(B)
    ball_actor = sim.scene.free_bodies[0].actor_index
    state0 = state0._replace(
        root=state0.root.at[:, ball_actor, 7:10].set(jnp.asarray([-5.5, 0.2, 1.5])))
    nd = sim.scene.num_dofs
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.uniform(-0.2, 0.2, (B, nd)).astype(np.float32))
    eff = jnp.zeros((B, nd))

    fused = jax.jit(sim._step_batched_pallas)
    xla = jax.jit(sim._step_vmapped)
    sf = sx = state0
    for _ in range(20):
        sf = fused(sf, tgt, eff)
        sx = xla(sx, tgt, eff)

    hum = sim.scene.articulations[0].actor_index
    np.testing.assert_allclose(np.asarray(sf.dof_pos), np.asarray(sx.dof_pos),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 0:3]),
                               np.asarray(sx.root[:, hum, 0:3]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 3:7]),
                               np.asarray(sx.root[:, hum, 3:7]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 7:13]),
                               np.asarray(sx.root[:, hum, 7:13]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sf.root[:, ball_actor, 0:3]),
                               np.asarray(sx.root[:, ball_actor, 0:3]), atol=5e-2)
    assert np.isfinite(np.asarray(sf.net_contact_force)).all()


def test_floating_fused_ground_support(c10):
    """Standing humanoid must be supported by ground contacts on the fused
    path: base height stays near its start over half a second of sim."""
    env, sim = c10
    B = 128
    state = sim.initial_state(B)
    nd = sim.scene.num_dofs
    tgt = jnp.zeros((B, nd))
    eff = jnp.zeros((B, nd))
    hum = sim.scene.articulations[0].actor_index
    z0 = float(state.root[0, hum, 2])
    step = jax.jit(sim._step_batched_pallas)
    for _ in range(30):
        state = step(state, tgt, eff)
    z = np.asarray(state.root[:, hum, 2])
    assert np.isfinite(z).all()
    # ground contact keeps it from free-falling (free fall over 30 steps
    # at dt=1/60 would drop ~1.2 m)
    assert (z > z0 - 0.35).all()
