"""Functional vectorized-task base — the VecTask equivalent (SURVEY.md §2 N7).

The reference VecTask owns buffers and a host-driven step loop with a
``reset_buf.nonzero()`` device->host round trip
(/root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:1045).
Here the whole step — action scaling, physics substeps, reward, **auto-reset**
and observation — is one pure jitted function over a batched ``EnvState``
pytree; resets are a branch-free ``where`` merge with per-env PRNG keys
(no host sync, SURVEY.md §7.4).

Subclasses implement single-env hooks; this base vmaps/jits them.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.sim.scene import SceneSpec, compile_scene
from isaacgym_tpu.sim.simulator import SimState, Simulator


class EnvState(NamedTuple):
    sim: SimState                  # batched (B, ...)
    progress: jnp.ndarray          # (B,) int32
    rng: jnp.ndarray               # (B,) jax PRNG keys
    flags: Dict[str, jnp.ndarray]  # task one-shot flags, each (B,)
    pre_ball_root: jnp.ndarray     # (B, 13) ball root before the last physics step
    dr: Any = None                 # batched DRParams when DR is enabled
    randomize_buf: Any = None      # (B,) steps since last re-randomization
    global_step: Any = None        # () int32 (drives DR schedules)
    ep_return: Any = None          # (B,) running episode return (telemetry)


class TpuVecTask:
    """Base class for the pingpong task family.

    Contract mirrored from the reference (SURVEY.md §1 L3): the subclass
    ctor sets ``cfg["env"]["numObservations"]`` / ``["numActions"]`` before
    calling ``super().__init__``; buffers become return values instead of
    mutable members.
    """

    #: actor index of the ball within the per-env scene (subclass override)
    ball_actor: int = 2

    #: flag -> event-name map surfaced as per-episode event outcomes in
    #: ``info`` (reference event prints / C10 diagnostic counters);
    #: None = every ``*_count`` flag under its stripped name. Subclasses may
    #: map ``*_calculated`` one-shots too (e.g. C7's hit/miss).
    event_flag_names: Optional[Dict[str, str]] = None

    def __init__(self, cfg: Dict[str, Any], seed: int = 42):
        self.cfg = cfg
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.num_obs = int(env_cfg["numObservations"])
        self.num_actions = int(env_cfg["numActions"])
        self.max_episode_length = int(env_cfg["episodeLength"])
        self.clip_actions = float(env_cfg.get("clipActions", 1.0))
        self.seed = int(seed)

        self.scene_spec: SceneSpec = self.create_scene()
        self.scene = compile_scene(self.scene_spec)
        self.sim = Simulator(self.scene)

        # domain randomization (SURVEY.md §5.9): spec-driven, off by default
        task_cfg = cfg.get("task", {}) or {}
        self.randomize = bool(task_cfg.get("randomize", False))
        if self.randomize:
            from isaacgym_tpu.env.randomize import DomainRandomizer
            self.randomizer = DomainRandomizer(
                task_cfg.get("randomization_params", {}), self.scene.num_dofs)
        else:
            self.randomizer = None

        # PD action mapping from DOF limits (reference .../no_earlystop.py:672-673)
        lo, hi = self._action_dof_limits()
        self._pd_action_offset = jnp.asarray(0.5 * (hi + lo), dtype=jnp.float32)
        self._pd_action_scale = jnp.asarray(0.5 * (hi - lo), dtype=jnp.float32)

        # camera sensors (reference enableCameraSensors yaml key; the
        # IsaacGym product's create_camera_sensor/get_camera_image): opt-in
        # raycast cameras over the analytic geoms (sensors/camera.py)
        self.cameras = []
        if str(env_cfg.get("enableCameraSensors", "false")).lower() in ("1", "true"):
            from isaacgym_tpu.sensors import Camera
            for cam_cfg in (env_cfg.get("cameras") or [{}]):
                self.cameras.append(Camera(self.scene, **cam_cfg))

        # body-state subset: tasks declare which env-level bodies obs/reward
        # touch; computing just those avoids full 40-body FK reporting
        ids = self.rb_body_ids()
        self._rb_fn = (self.sim.rigid_body_states if ids is None
                       else self.sim.make_body_state_fn(ids))

        self._step_fn = jax.jit(self._step_impl, donate_argnums=(0,))
        self._reset_fn = jax.jit(self._initial_env_state)

    # ------------------------------------------------------------------
    # subclass hooks (single env unless stated)
    # ------------------------------------------------------------------

    def create_scene(self) -> SceneSpec:
        raise NotImplementedError

    def init_flags(self) -> Dict[str, jnp.ndarray]:
        """Scalar (unbatched) initial one-shot flag values."""
        return {}

    def rb_body_ids(self):
        """Env-level body indices the task's obs/reward functions read, or
        None for all bodies. Rows of ``rb_states`` follow this order."""
        return None

    def reset_sim_single(self, key, sim: SimState) -> SimState:
        """Reset one env's sim state (root states, ball velocity, ...)."""
        raise NotImplementedError

    def observe_single(self, sim: SimState, rb_states, flags) -> jnp.ndarray:
        raise NotImplementedError

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Returns (reward, reset, updated flags)."""
        raise NotImplementedError

    def _action_dof_limits(self) -> Tuple[np.ndarray, np.ndarray]:
        """(lower, upper) per actuated dof; default: all scene dofs."""
        los, his = [], []
        for slot in self.scene.articulations:
            los.append(slot.model.tree.lower)
            his.append(slot.model.tree.upper)
        return np.concatenate(los), np.concatenate(his)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def reset(self) -> Tuple[EnvState, jnp.ndarray]:
        """Fresh env state + initial observations (jitted)."""
        return self._reset_fn()

    def step(self, state: EnvState, actions) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
        """One vectorized env step: (state', obs, reward, done, info)."""
        return self._step_fn(state, actions)

    def render_camera(self, state: EnvState, index: int = 0):
        """Render camera ``index`` over every env: dict(depth, rgb, seg)."""
        return self.cameras[index].render(self.sim, state.sim)

    @property
    def step_fn(self):
        """The raw jitted step for embedding in training ``lax.scan`` loops."""
        return self._step_fn

    # ------------------------------------------------------------------
    # implementation
    # ------------------------------------------------------------------

    def _initial_env_state(self) -> Tuple[EnvState, jnp.ndarray]:
        B = self.num_envs
        # raw uint32 (B,2) keys: branch-free to merge with jnp.where
        base = jax.random.PRNGKey(self.seed)
        keys = jax.random.split(base, B)
        sim0 = self.sim.initial_state(B)

        def reset_one(key, sim_single):
            k_use, k_next = jax.random.split(key)
            return self.reset_sim_single(k_use, sim_single), k_next

        sim1, keys = jax.vmap(reset_one)(keys, sim0)
        flags = {k: jnp.broadcast_to(v, (B,) + jnp.shape(v)) for k, v in self.init_flags().items()}
        dr = randomize_buf = global_step = None
        if self.randomize:
            dr_keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys)
            global_step = jnp.asarray(0, jnp.int32)
            dr = jax.vmap(lambda k: self.randomizer.sample(k, global_step))(dr_keys)
            randomize_buf = jnp.zeros(B, jnp.int32)
        state = EnvState(
            sim=sim1,
            progress=jnp.zeros(B, jnp.int32),
            rng=keys,
            flags=flags,
            pre_ball_root=sim1.root[:, self.ball_actor, :],
            dr=dr,
            randomize_buf=randomize_buf,
            global_step=global_step,
            ep_return=jnp.zeros(B, jnp.float32),
        )
        rb = self._rb_fn(sim1)
        obs = jax.vmap(self.observe_single)(sim1, rb, flags)
        return state, obs

    def action_to_drive(self, actions):
        """Map clipped actions to (pd_targets, efforts). Default: PD position
        targets from the limit-derived offset/scale (reference :1019);
        effort-control tasks (C11) override."""
        targets = self._pd_action_offset + self._pd_action_scale * actions
        return targets, jnp.zeros_like(targets)

    def _step_impl(self, state: EnvState, actions):
        if self.randomize:
            noise_key = jax.random.fold_in(jax.random.PRNGKey(self.seed + 101),
                                           state.global_step)
            actions = self.randomizer.action_noise(noise_key, actions)
        actions = jnp.clip(actions, -self.clip_actions, self.clip_actions)
        targets, efforts = self.action_to_drive(actions)

        pre_ball = state.sim.root[:, self.ball_actor, :]
        if self.randomize:
            sim = self.sim.step_dr(state.sim, targets, efforts, state.dr)
        else:
            sim = self.sim.step(state.sim, targets, efforts)
        progress = state.progress + 1

        rb = self._rb_fn(sim)
        rew, reset, flags = jax.vmap(self.reward_single)(
            pre_ball, sim, rb, state.flags, progress)

        # branch-free auto-reset: compute the would-be reset state for every
        # env, merge with where (replaces reference reset_buf.nonzero())
        def reset_one(key, sim_single):
            k_use, k_next = jax.random.split(key)
            return self.reset_sim_single(k_use, sim_single), k_next

        sim_reset, next_keys = jax.vmap(reset_one)(state.rng, sim)
        do = reset.astype(bool)
        # per-episode event outcomes: boolean one-shot flags latched by the
        # reward state machine, sampled at the episode boundary before the
        # reset clears them (reference C10 diagnostic counters,
        # humanoid_pingpong_3_actor_all_dof.py:283-292,918-931, and the
        # event prints in the C6/C7 reward fns)
        ev_map = (self.event_flag_names if self.event_flag_names is not None
                  else {k: k[:-len("_count")] for k in flags
                        if k.endswith("_count")})
        events = {name: do & flags[flag].astype(bool)
                  for flag, name in ev_map.items()}

        def merge(a, b):
            mask = do.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        sim = jax.tree.map(merge, sim_reset, sim)
        rng = jnp.where(do[:, None], next_keys, state.rng)
        progress = jnp.where(do, 0, progress)
        init_flags = self.init_flags()
        flags = {k: jnp.where(do, init_flags[k], v) for k, v in flags.items()}

        rb = self._rb_fn(sim)
        obs = jax.vmap(self.observe_single)(sim, rb, flags)

        dr, randomize_buf, global_step = state.dr, state.randomize_buf, state.global_step
        if self.randomize:
            # re-randomize resetting envs whose counter passed ``frequency``
            # (reference randomize_buf semantics, VecTask.apply_randomizations)
            global_step = state.global_step + 1
            randomize_buf = state.randomize_buf + 1
            resample = do & (randomize_buf >= self.randomizer.frequency)
            dr_keys = jax.vmap(lambda k: jax.random.fold_in(k, 13))(rng)
            dr_new = jax.vmap(lambda k: self.randomizer.sample(k, global_step))(dr_keys)
            def pick(a, b):
                mask = resample.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(mask, a, b)
            dr = jax.tree.map(pick, dr_new, state.dr)
            randomize_buf = jnp.where(resample, 0, randomize_buf)
            noise_key = jax.random.fold_in(jax.random.PRNGKey(self.seed + 202), global_step)
            obs = self.randomizer.observation_noise(noise_key, obs)

        # episode statistics (rl_games RLGPUAlgoObserver capability, N11)
        finished_return = state.ep_return + rew
        ep_return = jnp.where(do, 0.0, finished_return)

        new_state = EnvState(sim=sim, progress=progress, rng=rng, flags=flags,
                             pre_ball_root=pre_ball, dr=dr,
                             randomize_buf=randomize_buf, global_step=global_step,
                             ep_return=ep_return)
        # same boundary as the reference reset condition (progress >= len-1)
        time_outs = state.progress + 1 >= self.max_episode_length - 1
        info = {
            "time_outs": time_outs & do,
            "episode_done": do,
            "episode_return": jnp.where(do, finished_return, 0.0),
            "episode_length": jnp.where(do, state.progress + 1, 0),
            "episode_events": events,
        }
        return new_state, obs, rew, reset, info
