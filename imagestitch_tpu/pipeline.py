"""Pipeline driver (placeholder — filled in as stages land)."""


class Stitcher:  # pragma: no cover - placeholder
    pass


def stitch(*a, **k):  # pragma: no cover - placeholder
    raise NotImplementedError


def stitch_pair(*a, **k):  # pragma: no cover - placeholder
    raise NotImplementedError
