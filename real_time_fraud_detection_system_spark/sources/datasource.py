"""Custom Python DataSource (Spark 4 DataSource API): the reference's
training generator as a first-class ``spark.read.format("fraudgen")``
source.

The reference produces synthetic rows from a driver-side numpy RNG
(services/training/app/training.py:14-40) -- unreproducible and
single-process. operators/mlqueries.py already re-derives it as a
counter-based md5 generator in pure Catalyst SQL; THIS module is the
same recipe a third time, as a partitioned Python data source, and the
three agree BIT-FOR-BIT (tests compare this source's rows against the
SQL twin row-for-row; the DuckDB oracle already gates the SQL twin).

Why it matters at scale: partitions() splits the id range, so each
executor generates its own slice -- 10^12 rows is the same code as
10^3, no driver bottleneck, and a retry regenerates identical rows
(pure function of id). The fiddly part is replicating Spark's float
semantics in Python, documented inline:

  * md5 windows -> uniforms: exact integer/hex math, trivially equal.
  * left-to-right IEEE sums: python evaluates ``u0 + u1 + ...`` in the
    same order as the SQL text, so the Irwin-Hall normals are
    bit-identical.
  * round(x, d): Spark rounds doubles via
    BigDecimal.valueOf(x).setScale(d, HALF_UP), i.e. HALF_UP on the
    SHORTEST DECIMAL REPRESENTATION of the double -- which is exactly
    python's repr(float); Decimal(repr(x)) + ROUND_HALF_UP replays it.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

try:  # pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )
except ImportError:  # pragma: no cover - older pyspark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = None  # type: ignore[assignment]

N_DIGESTS = 7  # 4 uniforms per md5 digest; 27 draws need 7 digests


def _spark_round(x: float, digits: int) -> float:
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def generate_row(id_: int) -> tuple:
    """The mlqueries._frame_sql recipe for one id, float-op-exact."""
    u = []
    for j in range(N_DIGESTS):
        d = hashlib.md5(f"{id_}:g{j}".encode()).hexdigest()
        for w in range(4):
            u.append(int(d[8 * w : 8 * w + 8], 16) / 4294967296.0)
    z1 = u[0]
    for t in u[1:12]:
        z1 = z1 + t
    z1 = z1 - 6.0
    z2 = u[12]
    for t in u[13:24]:
        z2 = z2 + t
    z2 = z2 - 6.0
    import math

    amount = _spark_round(math.exp(3.0 + z1), 2)
    num_items = max(1, int(_spark_round(2.0 + z2, 0)))
    merchant_risk = u[24]
    hour = float(math.floor(u[25] * 24.0))
    night = 1.0 if hour in (0.0, 1.0, 2.0, 3.0, 23.0) else 0.0
    p = 1.0 / (1.0 + math.exp(-(0.002 * amount + 1.5 * merchant_risk
                                + 0.05 * night - 2.5)))
    label = 1 if u[26] < p else 0
    return (id_, amount, num_items, merchant_risk, hour, label)


class _FraudgenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        i = partition.value
        start = i * self.n // self.num_partitions
        end = (i + 1) * self.n // self.num_partitions
        for id_ in range(start, end):
            yield generate_row(id_)


class _SlicePartition(InputPartition if InputPartition else object):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _FraudgenStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader (DataSourceStreamReader --
    the PARTITIONED Spark 4 streaming Python source API, not the
    single-partition Simple variant): offsets are plain row ids, each
    trigger advances the high-watermark by ``rowsPerBatch`` (capped at
    ``maxRows`` when set), and a batch's id range splits across
    ``partitions`` executor slices. Rows are pure functions of id, so
    a crash-replayed batch regenerates BIT-IDENTICAL rows -- replayable
    like a Kafka range fetch, exactly-once with any idempotent sink,
    no broker required.

    Restart discipline: Spark replays the last planned batch by its
    RECORDED (start, end) via partitions() before asking for a new
    latestOffset, so both partitions() and commit() fast-forward the
    driver-side watermark -- a fresh reader instance can never hand
    back an offset behind the checkpoint."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.max_rows = int(options.get("maxRows", 0))  # 0 = unbounded
        self._current = 0

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        nxt = self._current + self.rows_per_batch
        if self.max_rows:
            nxt = min(nxt, self.max_rows)
        self._current = max(self._current, nxt)
        return {"id": self._current}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["id"]), int(end["id"])
        self._current = max(self._current, e)
        n = max(1, self.num_partitions)
        return [
            _SlicePartition(
                s + i * (e - s) // n, s + (i + 1) * (e - s) // n
            )
            for i in range(n)
        ]

    def read(self, partition):
        for id_ in range(partition.start, partition.end):
            yield generate_row(id_)

    def commit(self, end: dict) -> None:
        self._current = max(self._current, int(end["id"]))


class FraudgenDataSource(DataSource):
    """spark.read.format("fraudgen").option("n", N) -> the deterministic
    labelled training frame, generated executor-side per partition;
    spark.readStream.format("fraudgen").option("rowsPerBatch", B) ->
    the same rows as a replayable micro-batched stream."""

    @classmethod
    def name(cls) -> str:
        return "fraudgen"

    def schema(self) -> str:
        return (
            "id bigint, amount double, num_items int,"
            " merchant_risk double, hour double, label int"
        )

    def reader(self, schema):
        return _FraudgenReader(self.options)

    def streamReader(self, schema):
        return _FraudgenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FraudgenDataSource)
