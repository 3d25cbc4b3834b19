"""Lazy loader for the distributed actor-learner protocol."""


def __getattr__(name):
  from . import parallel_impl
  return getattr(parallel_impl, name)
