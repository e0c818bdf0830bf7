from . import images, io, metrics, render
