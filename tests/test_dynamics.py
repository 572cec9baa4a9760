"""Dynamics tests vs analytic pendula (SURVEY.md §4 unit-test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.ops import dynamics as D

GRAV = jnp.asarray([0.0, 0.0, -9.81])
IDENT = jnp.asarray([0.0, 0.0, 0.0, 1.0])
ZERO3 = jnp.zeros(3)

PENDULUM = """
<robot name="pend">
  <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
  <link name="arm">
    <inertial><origin xyz="0 0 -0.5"/><mass value="2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <link name="tip">
    <inertial><mass value="0.5"/><inertia ixx="0.001" iyy="0.001" izz="0.001"/></inertial>
  </link>
  <joint name="swing" type="revolute">
    <origin xyz="0 0 0"/><parent link="base"/><child link="arm"/>
    <axis xyz="0 1 0"/><limit lower="-6.28" upper="6.28" effort="100" velocity="100"/>
  </joint>
  <joint name="tip_weld" type="fixed">
    <origin xyz="0 0 -1.0"/><parent link="arm"/><child link="tip"/>
  </joint>
</robot>
"""

DOUBLE_PENDULUM = """
<robot name="dpend">
  <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
  <link name="l1">
    <inertial><origin xyz="0 0 -0.5"/><mass value="1.5"/>
      <inertia ixx="0.03" iyy="0.03" izz="0.002"/></inertial>
  </link>
  <link name="l2">
    <inertial><origin xyz="0 0 -0.4"/><mass value="0.8"/>
      <inertia ixx="0.015" iyy="0.015" izz="0.001"/></inertial>
  </link>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 0"/><parent link="base"/><child link="l1"/>
    <axis xyz="0 1 0"/><limit lower="-9" upper="9" effort="100" velocity="100"/>
  </joint>
  <joint name="j2" type="revolute">
    <origin xyz="0 0 -1.0"/><parent link="l1"/><child link="l2"/>
    <axis xyz="0 1 0"/><limit lower="-9" upper="9" effort="100" velocity="100"/>
  </joint>
</robot>
"""


def _model(xml, floating=False):
    return D.build_articulation(K.compile_tree(U.parse_urdf(xml, from_string=True), floating_base=floating))


def test_pendulum_acceleration_analytic():
    model = _model(PENDULUM)
    theta = 0.6
    # I about pivot: arm (0.02 + 2*0.5^2) + tip (0.001 + 0.5*1^2)
    I_pivot = 0.02 + 2 * 0.25 + 0.001 + 0.5 * 1.0
    expected = -9.81 * (2 * 0.5 + 0.5 * 1.0) * np.sin(theta) / I_pivot
    udot, _ = D.forward_dynamics(model, ZERO3, IDENT, jnp.asarray([theta]), jnp.zeros(1),
                                 jnp.zeros(1), GRAV)
    np.testing.assert_allclose(float(udot[0]), expected, rtol=1e-4)


def test_pendulum_applied_torque():
    model = _model(PENDULUM)
    I_pivot = 0.02 + 2 * 0.25 + 0.001 + 0.5 * 1.0
    udot, _ = D.forward_dynamics(model, ZERO3, IDENT, jnp.zeros(1), jnp.zeros(1),
                                 jnp.asarray([2.0]), jnp.zeros(3))
    np.testing.assert_allclose(float(udot[0]), 2.0 / I_pivot, rtol=1e-4)


def test_zero_state_zero_accel():
    model = _model(DOUBLE_PENDULUM)
    udot, _ = D.forward_dynamics(model, ZERO3, IDENT, jnp.zeros(2), jnp.zeros(2),
                                 jnp.zeros(2), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(udot), 0.0, atol=1e-6)


def test_mass_matrix_spd():
    model = _model(DOUBLE_PENDULUM)
    q = jnp.asarray([0.4, -0.9])
    base_pos, base_quat = ZERO3, IDENT
    fp, fq, com_w, axis_w, I_w = D.link_geometry(model, base_pos, base_quat, q)
    J_ang, J_lin = D.jacobians(model, fp, axis_w, com_w, base_pos)
    M = np.asarray(D.mass_matrix(model, J_ang, J_lin, I_w))
    np.testing.assert_allclose(M, M.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def _simulate(model, q, qd, steps, dt, gravity=GRAV):
    def step(carry, _):
        q, qd = carry
        udot, _ = D.forward_dynamics(model, ZERO3, IDENT, q, qd, jnp.zeros_like(q), gravity)
        qd = qd + dt * udot
        q = q + dt * qd
        return (q, qd), None

    (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=steps)
    return q, qd


def _energy(model, q, qd, gravity=-9.81):
    wv = D.link_velocities(model, q, qd)
    w, v = wv[:, 0:3], wv[:, 3:6]
    base_pos, base_quat, qq = ZERO3, IDENT, q
    fp, fq, com_w, axis_w, I_w = D.link_geometry(model, base_pos, base_quat, qq)
    m = jnp.asarray(model.link_mass)
    ke = 0.5 * jnp.sum(m * jnp.sum(v * v, -1)) + 0.5 * jnp.sum(jnp.einsum("la,lab,lb->l", w, I_w, w))
    pe = -gravity * jnp.sum(m * com_w[:, 2])
    return float(ke + pe)


def test_double_pendulum_energy_conservation():
    model = _model(DOUBLE_PENDULUM)
    q = jnp.asarray([1.2, 0.5])
    qd = jnp.asarray([0.0, 0.0])
    e0 = _energy(model, q, qd)
    dt = 5e-4
    q1, qd1 = _simulate(model, q, qd, 2000, dt)  # 1 s
    e1 = _energy(model, q1, qd1)
    # semi-implicit Euler at small dt: < 1% drift over a second
    assert abs(e1 - e0) / abs(e0) < 0.01, (e0, e1)


def test_floating_base_free_fall():
    model = _model(DOUBLE_PENDULUM.replace('name="dpend"', 'name="dpend_f"'), floating=True)
    assert model.nv == 8
    q = jnp.asarray([0.3, -0.2])
    u = jnp.zeros(8)
    udot, _ = D.forward_dynamics(model, jnp.asarray([0.0, 0, 2.0]), IDENT, q, u,
                                 jnp.zeros(8), GRAV)
    out = np.asarray(udot)
    # angular accel 0, linear accel = g, joint accel 0 (free fall is torque-free)
    np.testing.assert_allclose(out[0:3], 0.0, atol=1e-4)
    np.testing.assert_allclose(out[3:6], [0, 0, -9.81], atol=1e-4)
    np.testing.assert_allclose(out[6:8], 0.0, atol=1e-4)


def test_g1_dynamics_runs_batched():
    import os
    from isaacgym_tpu.models.assets import generate
    path = os.path.join(generate.ASSET_DIR, "g1_29dof_rev_1_0_pingpong_fixed_except_right_arm.urdf")
    if not os.path.exists(path):
        generate.generate_all()
    model = D.build_articulation(K.load_asset(path))
    B = 16
    q = jnp.zeros((B, 7))
    u = jnp.zeros((B, 7))
    tau = jnp.zeros((B, 7))
    base_pos = jnp.tile(jnp.asarray([0.0, 0, 1.0]), (B, 1))
    base_quat = jnp.tile(IDENT, (B, 1))
    fn = jax.vmap(lambda bp, bq, q, u, t: D.forward_dynamics(model, bp, bq, q, u, t, GRAV)[0])
    udot = fn(base_pos, base_quat, q, u, tau)
    assert udot.shape == (B, 7)
    assert np.all(np.isfinite(np.asarray(udot)))
    # gravity pulls the arm: some nonzero acceleration expected
    assert np.abs(np.asarray(udot)).max() > 0.1


def test_point_jacobian_matches_fd():
    model = _model(DOUBLE_PENDULUM)
    q = jnp.asarray([0.7, -0.3])
    # point: l2 frame origin offset along -z by 0.4 (com of l2)
    def point_of(qq):
        fp, fq = K.fk_dof_frames(model.tree, ZERO3, IDENT, qq)
        from isaacgym_tpu.utils import rotations as rot
        return fp[1] + rot.quat_rotate(fq[1], jnp.asarray([0.0, 0, -0.4]))

    p = point_of(q)
    J = D.point_jacobian(model, ZERO3, IDENT, q, link=1, point_w=p)
    J_fd = np.asarray(jax.jacobian(point_of)(q))
    np.testing.assert_allclose(np.asarray(J), J_fd, atol=1e-4)
