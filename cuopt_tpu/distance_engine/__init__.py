from cuopt_tpu.distance_engine.waypoint_matrix import WaypointMatrix

__all__ = ["WaypointMatrix"]
