from .bag import BagReader, BagWriter
