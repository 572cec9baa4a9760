"""Task registry — capability of the reference ``isaacgym_task_map``
(/root/reference/tasks/__init__.py:92-123). Includes the names the reference
registers plus the in-repo-but-unregistered variants (SURVEY.md C9-C11), and
the ``HumanoidPingpongTiltGaussFTG1`` entry whose module is absent from the
reference snapshot (tasks/__init__.py:51,121) — aliased to the C7
gauss-paddle task, which implements that reward family.
"""

from __future__ import annotations

from typing import Dict


def task_registry() -> Dict[str, type]:
    from isaacgym_tpu.tasks.humanoid_pingpong import HumanoidPingpong
    from isaacgym_tpu.tasks.humanoid_pingpong_tilt import HumanoidPingpongTilt
    from isaacgym_tpu.tasks.humanoid_pingpong_tilt_no_earlystop import (
        HumanoidPingpongTiltNoEarlyStop,
    )
    from isaacgym_tpu.tasks.humanoid_pingpong_4actor_tilt import Humanoid12PingpongTilt
    from isaacgym_tpu.tasks.humanoid_pingpong_alignment import HumanoidPingpongAlignment
    from isaacgym_tpu.tasks.humanoid_pingpong_draft_5actor import HumanoidPingpong5Actor

    registry: Dict[str, type] = {
        # registered in the reference task map (tasks/__init__.py:118-122)
        "HumanoidPingpongG1": HumanoidPingpong,
        "HumanoidPingpongTiltG1": HumanoidPingpongTilt,
        "HumanoidPingpongTiltNoEarlyStopG1": HumanoidPingpongTiltNoEarlyStop,
        "HumanoidPingpongTiltGaussFTG1": HumanoidPingpongTiltNoEarlyStop,
        "Humanoid12PingpongTiltG1": Humanoid12PingpongTilt,
        # in-repo but unregistered variants (SURVEY.md C9, C11)
        "HumanoidPingpongAlignmentG1": HumanoidPingpongAlignment,
        "HumanoidPingpong5ActorG1": HumanoidPingpong5Actor,
    }
    try:
        from isaacgym_tpu.tasks.humanoid_pingpong_27dof import (
            HumanoidPingpongTiltNESSparse27DOF,
        )
        registry["HumanoidPingpongTiltNESSparse27DOFG1"] = HumanoidPingpongTiltNESSparse27DOF
    except ImportError:
        pass
    return registry
