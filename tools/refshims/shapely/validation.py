def make_valid(geom):
    """The backend's contours are simple by construction; pass through."""
    return geom
