"""Task registry — capability of the reference ``isaacgym_task_map``
(/root/reference/tasks/__init__.py:92-123). Lazy imports keep startup cheap.
"""

from __future__ import annotations

from typing import Dict, Type


def task_registry() -> Dict[str, type]:
    from isaacgym_tpu.tasks.humanoid_pingpong_tilt_no_earlystop import (
        HumanoidPingpongTiltNoEarlyStop,
    )

    registry: Dict[str, type] = {
        "HumanoidPingpongTiltNoEarlyStopG1": HumanoidPingpongTiltNoEarlyStop,
    }
    try:
        from isaacgym_tpu.tasks.humanoid_pingpong import HumanoidPingpong
        registry["HumanoidPingpongG1"] = HumanoidPingpong
    except ImportError:
        pass
    try:
        from isaacgym_tpu.tasks.humanoid_pingpong_tilt import HumanoidPingpongTilt
        registry["HumanoidPingpongTiltG1"] = HumanoidPingpongTilt
    except ImportError:
        pass
    try:
        from isaacgym_tpu.tasks.humanoid_pingpong_4actor_tilt import Humanoid12PingpongTilt
        registry["Humanoid12PingpongTiltG1"] = Humanoid12PingpongTilt
    except ImportError:
        pass
    try:
        from isaacgym_tpu.tasks.humanoid_pingpong_27dof import HumanoidPingpongTiltNESSparse27DOF
        registry["HumanoidPingpongTiltNESSparse27DOFG1"] = HumanoidPingpongTiltNESSparse27DOF
    except ImportError:
        pass
    return registry
