from . import containers, radius, segment
