"""Device/runtime introspection.

Parity with spECK::spECKConfig (/root/reference/include/spECKConfig.h:8-53),
which queries SM count and shared-memory limits and allocates 6 streams +
4 timing events. On TPU there are no user-managed streams or events (XLA
schedules; timing is wall-clock around fetches), so the equivalent is a
snapshot of the device topology and the memory budgets the planner tunes
against (VMEM per core, HBM per chip).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    platform: str
    device_kind: str
    num_devices: int
    num_local_devices: int
    coords: Optional[tuple]
    hbm_bytes: Optional[int]

    @classmethod
    def current(cls) -> "DeviceInfo":
        devs = jax.devices()
        d = devs[0]
        stats = None
        try:
            ms = d.memory_stats()
            stats = ms.get("bytes_limit") if ms else None
        except Exception:
            pass
        return cls(
            platform=d.platform,
            device_kind=getattr(d, "device_kind", "unknown"),
            num_devices=len(devs),
            num_local_devices=len(jax.local_devices()),
            coords=getattr(d, "coords", None),
            hbm_bytes=stats,
        )

    def summary(self) -> str:
        hbm = f"{self.hbm_bytes / 2**30:.1f} GiB" if self.hbm_bytes else "?"
        return (
            f"{self.device_kind} ({self.platform}), "
            f"{self.num_devices} device(s) "
            f"({self.num_local_devices} local), HBM {hbm}"
        )


def device_info() -> DeviceInfo:
    return DeviceInfo.current()
