"""Pin the record-type registry to the reference's Process instances
(src/StreamingSocketProcess.scala:18-23) — guards against the round-1
fidelity bugs (wrong start_time_idx, swapped sms/address tags)."""

from __future__ import annotations

from sparkstreamingflume_spark.schemas import ARCHIVE_PREFIXES, GPRS, RECORD_TYPES


def test_six_socket_record_types():
    assert sorted(RECORD_TYPES) == ["61", "62", "63", "64", "65", "66"]


def test_reference_field_counts_and_phone_indices():
    # new Process(12,15,97,1,23,24,...) etc. — src/StreamingSocketProcess.scala:18-23
    expect = {
        "61": (97, (12, 15), 23, 24),
        "62": (91, (12, 15), 23, 24),
        "63": (50, (11,), 18, 19),
        "64": (50, (11,), 18, 19),
        "65": (61, (13, 16), 21, 22),
        "66": (61, (13, 16), 21, 22),
    }
    for p, (n, phones, lac, ci) in expect.items():
        rt = RECORD_TYPES[p]
        assert (rt.n_fields, rt.phone_idx, rt.lac_idx, rt.ci_idx) == (n, phones, lac, ci)


def test_start_time_is_one_for_all_types():
    # every Process ctor passes starttime=1 (src/StreamingSocketProcess.scala:18-23)
    assert all(rt.start_time_idx == 1 for rt in RECORD_TYPES.values())


def test_address_sms_tags_not_swapped():
    # 63/64 are address records, 65/66 are sms (sufix_flag values)
    assert RECORD_TYPES["63"].tag == "2g_address"
    assert RECORD_TYPES["64"].tag == "3g_address"
    assert RECORD_TYPES["65"].tag == "2g_sms"
    assert RECORD_TYPES["66"].tag == "3g_sms"


def test_gprs_projection_and_archive_prefixes():
    from sparkstreamingflume_spark.schemas import GPRS_PROJECTION

    assert GPRS.n_fields == 44 and GPRS.phone_idx == (0, 1, 2, 7)
    # processData emits fields 0,7,17,1,2,32,33,36,22,43 (src/DesenPross.scala:172-173)
    assert GPRS_PROJECTION == (0, 7, 17, 1, 2, 32, 33, 36, 22, 43)
    assert ARCHIVE_PREFIXES == ("60", "67", "68", "69", "70")
