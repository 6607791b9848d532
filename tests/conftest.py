import shutil
import tempfile

import numpy as np
import pytest

from lmw_tree_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="lmw-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_ck():
    d = tempfile.mkdtemp(prefix="lmw_ck_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def planted_signatures():
    """Planted-cluster bit signatures (FIXTURES.md §2): 8 seed centers, 256-bit,
    members flip each bit with p=0.05 → known structure + labels."""
    from lmw_tree_spark.functions.bitops import pack_bits, unpack_bits

    rng = np.random.default_rng(123)
    seeds = rng.integers(0, 2**63, (8, 4), dtype=np.uint64)
    sigs, labels = [], []
    for c in range(8):
        base = unpack_bits(seeds[c][None])[0]
        for _ in range(80):
            flips = (rng.random(256) < 0.05).astype(np.uint8)
            sigs.append(pack_bits((base ^ flips)[None])[0])
            labels.append(c)
    return np.array(sigs, dtype=np.uint64), np.array(labels)
