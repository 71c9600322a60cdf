"""Codec ABC (reference: torchpq/codec/BaseCodec.py:5-28 — train/encode/decode
plus an `is_trained` flag that serializes with the model)."""

from abc import abstractmethod

from ..module import StateModule


class BaseCodec(StateModule):
    def __init__(self, verbose=0):
        super().__init__(verbose=verbose)
        self.register_state("_is_trained", False)

    @property
    def is_trained(self):
        return bool(self._is_trained)

    def _set_trained(self, value=True):
        self.register_state("_is_trained", bool(value))

    @abstractmethod
    def train(self, x):
        ...

    @abstractmethod
    def encode(self, x):
        ...

    @abstractmethod
    def decode(self, code):
        ...
