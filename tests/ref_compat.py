"""Shared setup for tests that exercise the reference tree at /root/reference.

Inserts the reference on sys.path and stubs torchvision (absent here; the
reference only needs the import to resolve for the modules we compare).
"""

import os
import sys
import types

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "src"))

if HAVE_REF and REF not in sys.path:
    sys.path.insert(0, REF)

if HAVE_REF and "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.functional = types.ModuleType("torchvision.transforms.functional")
    tv.transforms.ColorJitter = object
    tv.transforms.ToTensor = object
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.transforms.functional"] = tv.transforms.functional

# py3.12 removed collections.Iterable; the reference's transform module uses it
import collections
import collections.abc

if not hasattr(collections, "Iterable"):
    collections.Iterable = collections.abc.Iterable
