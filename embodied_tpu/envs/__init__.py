from .dummy import Dummy
