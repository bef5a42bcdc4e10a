from .stepper import CNDynamics, CNGrid, CNSchedule, BarrierSpec, cn_solve

__all__ = ["CNDynamics", "CNGrid", "CNSchedule", "BarrierSpec", "cn_solve"]
