from . import blockgru
