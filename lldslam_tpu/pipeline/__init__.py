from .tracker import StereoTracker, TrackState  # noqa: F401
