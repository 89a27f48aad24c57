"""Spark schemas for the raw ingest feed (node wire format).

One raw row per block, exactly what the chainweb-node HTTP API returns
(SURVEY §2.1 S1-S3): the SSE ``/header/updates`` event or the batch
``/chain/N/block`` item —

- ``header``  : BlockHeader JSON (string).  Node encodes creationTime /
  epochStart in epoch-microseconds; target/weight as base64url little-endian
  256-bit ints.
- ``powHash`` : hex string (already little-endian-hex per Worker.hs:128-129).
- ``payload`` : BlockPayloadWithOutputs JSON (string): ``transactions`` is an
  array of [base64url(tx), base64url(output)] pairs; ``minerData`` and
  ``coinbase`` are base64url JSON documents.

All base64url decoding happens IN Spark (translate + unbase64 — JVM
codegen); the only Python is the 256-bit target/weight decode (pandas UDF,
ingest-only — reference parser test territory, SURVEY §5.1).
"""

from pyspark.sql import types as T

S = T.StringType()
L = T.LongType()

RAW_SCHEMA = T.StructType(
    [
        T.StructField("header", S, False),
        T.StructField("powHash", S, False),
        T.StructField("payload", S, False),
    ]
)

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("creationTime", L),  # epoch µs
        T.StructField("chainId", L),
        T.StructField("height", L),
        T.StructField("parent", S),
        T.StructField("hash", S),
        T.StructField("payloadHash", S),
        T.StructField("target", S),  # base64url LE 256-bit
        T.StructField("weight", S),
        T.StructField("epochStart", L),  # epoch µs
        T.StructField("nonce", S),  # stringly Word64
        T.StructField("featureFlags", L),
    ]
)

# payload envelope: tx pairs stay base64 until exploded
PAYLOAD_ENV_SCHEMA = T.StructType(
    [
        T.StructField("transactions", T.ArrayType(T.ArrayType(S))),
        T.StructField("minerData", S),
        T.StructField("coinbase", S),
        T.StructField("payloadHash", S),
    ]
)

MINER_DATA_SCHEMA = T.StructType(
    [
        T.StructField("account", S),
        T.StructField("predicate", S),
        T.StructField("public-keys", T.ArrayType(S)),
    ]
)

TX_SCHEMA = T.StructType(
    [
        T.StructField("hash", S),
        T.StructField("sigs", T.ArrayType(T.StructType([T.StructField("sig", S)]))),
        T.StructField("cmd", S),  # string containing JSON (node double-encodes)
    ]
)

# cmd JSON — typed scalars; 'data' fields stay raw JSON strings
# (from_json serializes objects back to text for StringType fields)
CMD_SCHEMA = T.StructType(
    [
        T.StructField("networkId", S),
        T.StructField("nonce", S),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("creationTime", T.DoubleType()),  # posix SECONDS
                    T.StructField("ttl", L),
                    T.StructField("gasLimit", L),
                    T.StructField("gasPrice", T.DoubleType()),
                    T.StructField("sender", S),
                    T.StructField("chainId", S),
                ]
            ),
        ),
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField(
                        "exec",
                        T.StructType(
                            [T.StructField("code", S), T.StructField("data", S)]
                        ),
                    ),
                    T.StructField(
                        "cont",
                        T.StructType(
                            [
                                T.StructField("pactId", S),
                                T.StructField("rollback", T.BooleanType()),
                                T.StructField("step", L),
                                T.StructField("data", S),
                                T.StructField("proof", S),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "signers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pubKey", S),
                        T.StructField("scheme", S),
                        T.StructField("addr", S),
                        T.StructField("clist", S),  # raw JSON array text
                    ]
                )
            ),
        ),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("gas", L),
        T.StructField("logs", S),
        T.StructField("reqKey", S),
        T.StructField("txId", L),
        T.StructField("events", S),  # raw JSON array text (exploded later)
        T.StructField("metadata", S),
        T.StructField("continuation", S),
        T.StructField(
            "result",
            T.StructType(
                [
                    T.StructField("status", S),
                    T.StructField("data", S),
                    T.StructField("error", S),
                ]
            ),
        ),
    ]
)

# one parsed event object (module is {namespace?, name}; params raw)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("name", S),
        T.StructField(
            "module",
            T.StructType([T.StructField("namespace", S), T.StructField("name", S)]),
        ),
        T.StructField("moduleHash", S),
        T.StructField("params", S),  # raw JSON array text
    ]
)

EVENTS_ARRAY_SCHEMA = T.ArrayType(EVENT_SCHEMA)
