"""Domain randomization engine (SURVEY.md §5.9, N7 ``apply_randomizations``).

The reference declares a DR spec in the task YAML
(/root/reference/cfg/task/HumanoidPingpongG1.yaml:88-157) — gaussian obs/
action noise, additive gravity noise, per-actor mass/friction/restitution/
PD-gain/limit randomization with linear schedules — executed imperatively by
VecTask at reset. Here the spec compiles into a pure sampling function over
per-env PRNG keys; the sampled :class:`DRParams` pytree rides in the env
state and is consumed branch-free inside the jitted physics step.

Supported spec surface (the attributes the reference spec uses):
  observations/actions: additive gaussian noise (range = [mean?, std]),
  sim_params.gravity: additive gaussian,
  actor_params.<name>.rigid_body_properties.mass: scaling uniform,
  .rigid_shape_properties.friction/restitution: scaling uniform,
  .dof_properties.damping/stiffness: scaling uniform,
  .dof_properties.lower/upper: additive gaussian.
Linear schedules ramp the randomization strength over ``schedule_steps``
env-steps; ``setup_only`` properties are sampled once at t=0 and frozen.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class DRParams(NamedTuple):
    """Per-env randomization parameters (single env; batched by vmap)."""
    gravity_offset: jnp.ndarray     # (3,)
    mass_scale: jnp.ndarray         # () uniform scale on articulated link masses
    friction_scale: jnp.ndarray     # ()
    restitution_scale: jnp.ndarray  # ()
    kp_scale: jnp.ndarray           # (nD,)
    kd_scale: jnp.ndarray           # (nD,)
    lower_shift: jnp.ndarray        # (nD,)
    upper_shift: jnp.ndarray        # (nD,)


def identity_params(num_dofs: int) -> DRParams:
    return DRParams(
        gravity_offset=jnp.zeros(3),
        mass_scale=jnp.asarray(1.0),
        friction_scale=jnp.asarray(1.0),
        restitution_scale=jnp.asarray(1.0),
        kp_scale=jnp.ones(num_dofs),
        kd_scale=jnp.ones(num_dofs),
        lower_shift=jnp.zeros(num_dofs),
        upper_shift=jnp.zeros(num_dofs),
    )


def _sched(spec: Dict[str, Any], step) -> jnp.ndarray:
    """Linear schedule factor in [0,1] (reference schedule semantics)."""
    if spec.get("schedule") == "linear":
        n = float(spec.get("schedule_steps", 1))
        return jnp.minimum(step.astype(jnp.float32) / n, 1.0)
    return jnp.asarray(1.0)


class DomainRandomizer:
    """Compiled sampler for one task's randomization_params spec."""

    def __init__(self, spec: Dict[str, Any], num_dofs: int):
        self.spec = spec or {}
        self.num_dofs = num_dofs
        self.frequency = int(self.spec.get("frequency", 600))
        obs_spec = self.spec.get("observations", {})
        act_spec = self.spec.get("actions", {})
        self.obs_noise = float(obs_spec.get("range", [0, 0])[1]) if obs_spec else 0.0
        self.act_noise = float(act_spec.get("range", [0, 0])[1]) if act_spec else 0.0
        self.gravity_spec = self.spec.get("sim_params", {}).get("gravity")
        # first actor entry = the humanoid (reference randomizes 'humanoid')
        actors = self.spec.get("actor_params", {})
        self.actor_spec = next(iter(actors.values())) if actors else {}

    def sample(self, key, global_step) -> DRParams:
        """Sample one env's DRParams (pure; vmap over envs)."""
        keys = jax.random.split(key, 8)
        p = identity_params(self.num_dofs)

        if self.gravity_spec is not None:
            s = _sched(self.gravity_spec, global_step)
            std = float(self.gravity_spec["range"][1])
            gz = jax.random.normal(keys[0], ()) * std * s
            p = p._replace(gravity_offset=jnp.asarray([0.0, 0.0, 1.0]) * gz)

        rb = self.actor_spec.get("rigid_body_properties", {})
        if "mass" in rb:
            spec = rb["mass"]
            lo, hi = spec["range"]
            s = _sched(spec, global_step)
            scale = jax.random.uniform(keys[1], (), minval=lo, maxval=hi)
            p = p._replace(mass_scale=1.0 + (scale - 1.0) * s)

        rs = self.actor_spec.get("rigid_shape_properties", {})
        if "friction" in rs:
            spec = rs["friction"]
            lo, hi = spec["range"]
            s = _sched(spec, global_step)
            scale = jax.random.uniform(keys[2], (), minval=lo, maxval=hi)
            p = p._replace(friction_scale=1.0 + (scale - 1.0) * s)
        if "restitution" in rs:
            spec = rs["restitution"]
            lo, hi = spec["range"]
            s = _sched(spec, global_step)
            scale = jax.random.uniform(keys[3], (), minval=lo, maxval=hi)
            p = p._replace(restitution_scale=1.0 + (scale - 1.0) * s)

        dp = self.actor_spec.get("dof_properties", {})
        if "stiffness" in dp:
            spec = dp["stiffness"]
            lo, hi = spec["range"]
            s = _sched(spec, global_step)
            scale = jax.random.uniform(keys[4], (self.num_dofs,), minval=lo, maxval=hi)
            p = p._replace(kp_scale=1.0 + (scale - 1.0) * s)
        if "damping" in dp:
            spec = dp["damping"]
            lo, hi = spec["range"]
            s = _sched(spec, global_step)
            scale = jax.random.uniform(keys[5], (self.num_dofs,), minval=lo, maxval=hi)
            p = p._replace(kd_scale=1.0 + (scale - 1.0) * s)
        if "lower" in dp:
            spec = dp["lower"]
            std = float(spec["range"][1])
            s = _sched(spec, global_step)
            p = p._replace(lower_shift=jax.random.normal(keys[6], (self.num_dofs,)) * std * s)
        if "upper" in dp:
            spec = dp["upper"]
            std = float(spec["range"][1])
            s = _sched(spec, global_step)
            p = p._replace(upper_shift=jax.random.normal(keys[7], (self.num_dofs,)) * std * s)
        return p

    def observation_noise(self, key, obs):
        if self.obs_noise <= 0.0:
            return obs
        return obs + jax.random.normal(key, obs.shape) * self.obs_noise

    def action_noise(self, key, actions):
        if self.act_noise <= 0.0:
            return actions
        return actions + jax.random.normal(key, actions.shape) * self.act_noise
