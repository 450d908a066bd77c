"""Appended to tests/test_select.py once kernel_table.json is generated."""


def test_shipped_table_covers_zoo_shapes():
    """The committed kernel table (kernels/kernel_table.json) must contain a
    measured winner for every Larq-Zoo binary-conv shape at batch 8 and 128,
    both domains, float AND bitpacked output — so zoo models dispatch on
    measurements, not the heuristic (VERDICT r2 #4; the reference's analogue
    is the measured rule set in `core/indirect_bgemm/select_kernel.h`)."""
    from compute_engine_tpu.kernels.select import (_DEFAULT_TABLE, _key,
                                                   reset_table,
                                                   select_bconv2d_kernel)

    assert _DEFAULT_TABLE, "kernels/kernel_table.json missing or empty"
    zoo = [(56, 56, 64, 64, 3), (28, 28, 128, 128, 3),
           (14, 14, 256, 256, 3), (7, 7, 512, 512, 3)]
    missing = []
    for (h, w, c_in, c_out, fh) in zoo:
        for batch in (8, 128):
            m = batch * h * w  # stride-1 SAME
            for domain in ("float", "packed"):
                for out_kind in ("float", "bitpacked"):
                    key = _key(domain, c_in, c_out, fh * fh, m, out_kind)
                    if key not in _DEFAULT_TABLE:
                        missing.append(key)
    assert not missing, f"unmeasured zoo keys: {missing}"

    # And selection actually returns the table entry (not the heuristic).
    reset_table()
    key = _key("float", 64, 64, 9, 128 * 56 * 56, "float")
    got = select_bconv2d_kernel("float", c_in=64, c_out=64, fh=3, fw=3,
                                m=128 * 56 * 56, out_kind="float")
    want = _DEFAULT_TABLE[key]
    assert got == want or (want == "s2d" and got == "mxu")
