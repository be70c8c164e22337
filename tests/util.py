import os

DATA = os.path.join(os.path.dirname(__file__), "data")


def data_path(name):
    return os.path.join(DATA, name)


def read_data(name):
    with open(data_path(name), "rb") as f:
        return f.read()


def read_meta(name):
    meta = {}
    with open(data_path(name + ".meta")) as f:
        for line in f:
            key, val = line.strip().split("=")
            meta[key] = int(val)
    return meta
