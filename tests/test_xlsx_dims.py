"""Excel ingestion (S4) + static dim broadcast join (S10/J8).

A synthetic workbook is built in-test (zipfile + sheet XML, the same
layout Excel writes) to pin the all-string / blank->'' contract; the
reference's actual shipped dim files are read too when present
(read-only fixtures — their content is data, not code).
"""

import os
import zipfile

import pytest

REF_DIMS = "/root/reference/reference"


def _make_xlsx(path: str) -> None:
    sheet = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>
<row r="3"><c r="A3" t="s"><v>3</v></c></row>
</sheetData></worksheet>"""
    shared = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>city</t></si><si><t>code</t></si><si><t>北京</t></si><si><t>上海</t></si></sst>"""
    workbook = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    rels = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1"
 Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"
 Target="worksheets/sheet1.xml"/></Relationships>"""
    types = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/></Types>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", types)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)


def test_read_excel_all_string_contract(tmp_path):
    from scraper_ray.sources.xlsx import read_excel

    p = str(tmp_path / "dim.xlsx")
    _make_xlsx(p)
    t = read_excel(p)
    assert t.column_names == ["city", "code"]
    # numbers come back as strings; missing cells as '' (NaN->'' parity,
    # reference utility_commons.py:74-93)
    assert t.column("city").to_pylist() == ["北京", "上海"]
    assert t.column("code").to_pylist() == ["42", ""]


@pytest.mark.usefixtures("ray_session")
def test_read_table_xlsx_roundtrip(tmp_path):
    from scraper_ray.sources.io import read_table

    p = str(tmp_path / "dim.xlsx")
    _make_xlsx(p)
    df = read_table(p).to_pandas()
    assert df["city"].tolist() == ["北京", "上海"]


@pytest.mark.skipif(not os.path.isdir(REF_DIMS),
                    reason="reference dim files not present")
def test_reference_shipped_dims_ingest():
    """The reference's actual lookup files load through the same path."""
    from scraper_ray.sources.dims import dim_lookup, load_dim_table

    city = dim_lookup(os.path.join(REF_DIMS, "BaiduMap_cityCode_1102.txt"),
                      "name", "area_id")
    assert city["嘉峪关市"] == "33"
    adcode = load_dim_table(os.path.join(REF_DIMS, "AMap_adcode_citycode.xlsx"))
    assert {"adcode", "citycode"} <= set(adcode.column_names)
    assert adcode.num_rows > 3000
    # everything is a string; blanks are '' — not None/NaN
    assert all(isinstance(x, str) for x in
               adcode.column("citycode").to_pylist()[:50])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.skipif(not os.path.isdir(REF_DIMS),
                    reason="reference dim files not present")
def test_dim_broadcast_join():
    import pyarrow as pa
    import ray
    import ray.data as rd

    from scraper_ray.sources.dims import broadcast_join, dim_lookup

    lookup = dim_lookup(os.path.join(REF_DIMS, "BaiduMap_cityCode_1102.txt"),
                        "name", "area_id")
    ref = ray.put(lookup)
    ds = rd.from_arrow(pa.table({
        "city": pa.array(["嘉峪关市", "金昌市", "不存在市"], pa.string())}))
    out = broadcast_join(ds, ref, "city", "area_id").to_pandas()
    assert out["area_id"].tolist()[:2] == ["33", "34"]
    assert out["area_id"].isna().tolist() == [False, False, True]


def test_write_excel_round_trip(tmp_path):
    """Writer (S5, reference df_to_excel): write -> read round-trips the
    all-string contract, including XML-escaped and CJK values."""
    import pyarrow as pa

    from scraper_ray.sources.xlsx import read_excel, sheet_names, write_excel

    path = str(tmp_path / "out.xlsx")
    t = pa.table({"city": ["北京", "a<b&\"c'", ""],
                  "code": ["010", "", "021"]})
    write_excel(t, path, "S1")
    assert read_excel(path, "S1").equals(t)

    # multi-sheet APPEND (utility_commons.py:103-107 load_workbook path)
    t2 = pa.table({"x": ["1"]})
    write_excel(t2, path, "S2")
    assert sheet_names(path) == ["S1", "S2"]
    assert read_excel(path, "S1").equals(t)
    assert read_excel(path, "S2").equals(t2)

    # same-named sheet: last write wins
    write_excel(pa.table({"x": ["9"]}), path, "S2")
    assert sheet_names(path) == ["S1", "S2"]
    assert read_excel(path, "S2").column("x").to_pylist() == ["9"]


@pytest.mark.usefixtures("ray_session")
def test_write_dataset_xlsx_sink(tmp_path):
    """write_dataset(..., format='xlsx'): dataset -> workbook -> Dataset
    round-trip through the io seam (values stringified per contract)."""
    import ray.data as rd

    from scraper_ray.sources.io import read_table, write_dataset

    path = str(tmp_path / "res.xlsx")
    ds = rd.from_items([{"k": i, "v": f"row{i}"} for i in range(7)])
    write_dataset(ds, path, format="xlsx")
    back = read_table(path).to_pandas()
    assert sorted(back["k"]) == [str(i) for i in range(7)]
    assert sorted(back["v"]) == [f"row{i}" for i in range(7)]
