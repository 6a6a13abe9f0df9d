"""SLAM orchestrator (placeholder — full state machine lands with ops/)."""


class Slam:  # pragma: no cover - replaced by the real orchestrator below
    def __init__(self, config=None):
        raise NotImplementedError("orchestrator under construction")
