"""Tiny torch net decorated with the REFERENCE's ``persistent_class``
(``utils/torch_utils/persistence.py:37``).  Lives in its own module
because the decorator captures the defining module's source and asserts
the class name is present in that module's ``__dict__`` at instantiation
(``persistence.py:109``) — classes defined inside a test function fail
that assert.  Import lazily (only when /root/reference is available)."""

import torch

from utils.torch_utils import persistence


@persistence.persistent_class
class Leaf(torch.nn.Module):
    def __init__(self, n):
        super().__init__()
        self.fc = torch.nn.Linear(n, n)
        self.register_buffer('gain', torch.ones(n) * 2.0)


@persistence.persistent_class
class Net(torch.nn.Module):
    def __init__(self, n=6):
        super().__init__()
        self.body = Leaf(n)
        self.w = torch.nn.Parameter(torch.randn(n, 3))
