"""C6 (HumanoidPingpongTiltG1) gradual-anneal curriculum driver.

Round-4 evidence (docs/LEARNING.md, docs/runs/c6_r4*.jsonl): the table-hit
one-shot never left background rate under either reference physics (overshoot
optimum) or softened physics (undershoot optimum), and a SINGLE-STEP
restitution jump 0.3->0.6 failed outright (cross_net flat 0.76%, table-hit
flat 0.07% over 5,500 epochs — docs/runs/c6_r4_curr_b.jsonl). Both failure
modes are distribution-shift: the strike the reward wants sits outside the
learned swing distribution of the stage before.

This driver closes the gap with the two levers the round-4 analysis asked
for (VERDICT r4 item 1):

1. a GRADUAL physics staircase — ballRestitution 0.3 -> 1.5 and launch speed
   [5.5, 6.1] -> [8.0, 8.6] interpolated over many small stages (each stage
   small enough that the previous stage's swing distribution still reaches
   the reward window), warm-started from the round-4 soft-physics checkpoint
   that already has the paddle skill (runs/c6_r4_curr/ckpt_0003500);
2. a dense landing shaping term (``landing_shaping`` CLI resolver — a
   gaussian on the ballistic predicted landing point, fired on the one-shot
   landing latch; tasks/humanoid_pingpong_tilt.py) held on through the
   staircase and ANNEALED TO ZERO at the end, so the final stage trains on
   the exact reference reward at the exact reference physics.

Each stage is a fresh ``train.py`` invocation (physics constants are
compile-time constants of the fused kernels, so a stage boundary is a
recompile) resuming from the previous stage's checkpoint into ONE shared
experiment dir — the merged ``metrics.jsonl`` is the tracked curve.

Usage: python tools/c6_curriculum.py [experiment] [--dry-run]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TASK = "HumanoidPingpongTiltG1"
WARM_START = "runs/c6_r4_curr/ckpt_0003500"   # epoch 3500, paddle 0.93 @ e=0.3
WARM_EPOCH = 3500
NUM_ENVS = 4096
SEED = 7
LR = 1e-4

# physics endpoints: soft curriculum stage (round-4 phase A) -> reference
# (cfg/task/HumanoidPingpongTiltG1.yaml: ballRestitution 1.5, speed 8.0-8.6)
E_SOFT, E_REF = 0.3, 1.5
LO_SOFT, LO_REF = 5.5, 8.0
HI_SOFT, HI_REF = 6.1, 8.6
N_HARDEN = 12          # 0.1 restitution / 0.21 m/s per step
SHAPING = 500.0


def build_stages():
    stages = []
    # stage 0: learn the shaping gradient at the soft physics the warm-start
    # checkpoint was trained on
    stages.append(dict(epochs=800, f=0.0, shaping=SHAPING))
    for k in range(1, N_HARDEN + 1):
        stages.append(dict(epochs=400, f=k / N_HARDEN, shaping=SHAPING))
    # Reference physics reached: consolidate, then anneal the shaping away
    # GRADUALLY and hold on the pure reference reward. (Round-5 in-flight
    # observation: each 400-epoch hardening stage re-tunes crossing quickly
    # but the landing band needs a longer fixed-physics window — the
    # breakthrough at e=1.0 took the full stage; at e>=1.2 400 epochs was
    # not enough, so the consolidation lives here.)
    stages.append(dict(epochs=1000, f=1.0, shaping=SHAPING))
    stages.append(dict(epochs=800, f=1.0, shaping=SHAPING * 0.4))
    stages.append(dict(epochs=1200, f=1.0, shaping=0.0))
    for st in stages:
        f = st["f"]
        st["restitution"] = round(E_SOFT + f * (E_REF - E_SOFT), 4)
        st["speed_lo"] = round(LO_SOFT + f * (LO_REF - LO_SOFT), 3)
        st["speed_hi"] = round(HI_SOFT + f * (HI_REF - HI_SOFT), 3)
    return stages


def last_logged_epoch(metrics_path):
    last = 0
    if os.path.exists(metrics_path):
        with open(metrics_path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        last = max(last, int(json.loads(line).get("epoch", 0)))
                    except json.JSONDecodeError:
                        pass
    return last


def main(argv):
    exp = argv[0] if argv and not argv[0].startswith("-") else "c6_r5_anneal"
    dry = "--dry-run" in argv
    stages = build_stages()
    run_dir = os.path.join(REPO, "runs", exp)
    os.makedirs(run_dir, exist_ok=True)

    cum = WARM_EPOCH
    manifest = []
    for i, st in enumerate(stages):
        st = dict(st, start_epoch=cum, end_epoch=cum + st["epochs"], stage=i)
        cum = st["end_epoch"]
        manifest.append(st)
    with open(os.path.join(run_dir, "stages.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)

    done_epoch = last_logged_epoch(os.path.join(run_dir, "metrics.jsonl"))
    ckpt = WARM_START
    final_ckpt = os.path.join("runs", exp, "ckpt_final")
    for st in manifest:
        if st["end_epoch"] <= done_epoch:
            print(f"stage {st['stage']} already complete (epoch {st['end_epoch']})")
            ckpt = final_ckpt
            continue
        # resume mid-stage from the shared dir if any progress was logged
        if done_epoch > WARM_EPOCH:
            ckpt = final_ckpt
        cmd = [
            sys.executable, "train.py", f"task={TASK}", f"experiment={exp}",
            f"num_envs={NUM_ENVS}", f"seed={SEED}",
            f"max_iterations={st['end_epoch']}",
            f"train.params.config.learning_rate={LR}",
            f"task.env.scene.ballRestitution={st['restitution']}",
            f"task.env.ball.initialSpeedRange=[{st['speed_lo']},{st['speed_hi']}]",
            f"landing_shaping={st['shaping']}",
            f"checkpoint={ckpt}",
        ]
        print(f"=== stage {st['stage']}: e={st['restitution']} "
              f"speed=[{st['speed_lo']},{st['speed_hi']}] w={st['shaping']} "
              f"epochs {st['start_epoch']}->{st['end_epoch']}", flush=True)
        print(" ".join(cmd), flush=True)
        if dry:
            continue
        rc = subprocess.run(cmd, cwd=REPO).returncode
        if rc != 0:
            print(f"stage {st['stage']} FAILED rc={rc}", flush=True)
            return rc
        ckpt = final_ckpt
        done_epoch = st["end_epoch"]
    print("curriculum complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
