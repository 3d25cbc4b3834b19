from .rpc import BatchServer, Client, Disconnected, Future, Server, free_port
from .proc import Process, Thread, run, setup
