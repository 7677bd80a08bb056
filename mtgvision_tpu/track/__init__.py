from mtgvision_tpu.track.tracker import Detection, TrackedObject, Tracker  # noqa: F401
