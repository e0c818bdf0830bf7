from . import common, dfsph, pbd, wcsph
