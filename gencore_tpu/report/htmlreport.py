"""Self-contained HTML QC report with plotly.js charts.

Functionally equivalent to reference src/htmlreporter.cpp: summary tables
(general + before/after details), duplication-level bar chart
(htmlreporter.cpp:354-403), per-contig genome-coverage red/blue mirror plots
with the top-1/500 outlier ceiling (htmlreporter.cpp:142-237), and BED
coverage plots (htmlreporter.cpp:239-303).
"""

from __future__ import annotations

import datetime

import numpy as np

from gencore_tpu import __version__
from gencore_tpu.options import Options
from gencore_tpu.stats import MAX_SUPPORTING_READS, Stats, _cxx_num

_UNITS = ["", "K", "M", "G", "T", "P"]


def _format_number(number: int) -> str:
    num = float(number)
    order = 0
    while num > 1000.0:
        order += 1
        num /= 1000.0
    if order == 0:
        return str(number)
    return f"{num:.6f} {_UNITS[order]}"


def _to_string(v: float) -> str:
    # C++ to_string(double) -> fixed 6 decimals
    return f"{v:.6f}"


def _y_ceiling(depth_lists: list, denominator: int) -> float:
    """Top-(1/denominator) outlier ceiling (reference htmlreporter.cpp:142-166):
    returns the value at rank size/denominator from the top."""
    all_vals = np.concatenate([np.asarray(d) for d in depth_lists]) if depth_lists else np.array([0])
    size = 1 + len(all_vals) // denominator
    if len(all_vals) == 0:
        return 0
    top = np.sort(all_vals)[::-1][:size]
    return float(top[-1]) if len(top) >= size else float(top[-1] if len(top) else 0)


def _series(vals) -> str:
    return ",".join(_cxx_num(float(v)) if v != int(v) else str(int(v)) for v in vals)


def write_html_report(path: str, opt: Options, pre: Stats, post: Stats,
                      command: str = "") -> None:
    now = datetime.datetime.now().strftime("%Y-%m-%d      %H:%M:%S")
    h = []
    h.append("<html><head><meta http-equiv=\"content-type\" content=\"text/html;charset=utf-8\" />")
    h.append(f"<title>gencore report at {now} </title>")
    h.append("<script src='https://cdn.plot.ly/plotly-latest.min.js'></script>")
    h.append("""<script type="text/javascript">
    function showOrHide(divname) {
        div = document.getElementById(divname);
        if(div.style.display == 'none') div.style.display = 'block';
        else div.style.display = 'none';
    }
</script>""")
    h.append("""<style type="text/css">
td {border:1px solid #dddddd;padding:5px;font-size:12px;}
table {border:1px solid #999999;padding:2x;border-collapse:collapse; width:800px}
.col1 {width:280px; font-weight:bold;}
.figure {width:800px;height:600px;}
.section_title {color:#ffffff;font-size:20px;padding:5px;text-align:left;background:#663355; margin-top:10px;}
.subsection_title {font-size:16px;padding:5px;margin-top:10px;text-align:left;color:#663355}
#container {text-align:center;padding:3px 3px 3px 10px;font-family:Arail,'Liberation Mono', Menlo, Courier, monospace;}
#footer {text-align:left;padding:15px;color:#ffffff;font-size:10px;background:#663355;}
</style>""")
    h.append("</head><body><div id='container'>")

    title = opt.report_title
    h.append(f"<h1 style='text-align:left;'><a href='https://github.com/OpenGene/gencore' target='_blank' style='color:#663355;text-decoration:none;'>{title}</a>")
    h.append("<div class='section_div'>")
    h.append("<div class='section_title' onclick=showOrHide('summary')><a name='summary'>Summary</a></div>")
    h.append("<div id='summary'>")

    def row(key, v):
        h.append(f"<tr><td class='col1'>{key}</td><td class='col2'>{v}</td></tr>")

    def trow(key, v1, v2):
        h.append(f"<tr><td class='col1'>{key}</td><td class='col2'>{v1}</td><td class='col3'>{v2}</td></tr>")

    h.append("<div class='subsection_title' onclick=showOrHide('general')>General</div>")
    h.append("<div id='general'><table class='summary_table'>")
    row("gencore-tpu version:", f"{__version__} (TPU-native engine)")
    row("mapping rate:", _to_string(pre.mapping_rate()))
    row("duplication rate:", _to_string(pre.dup_rate()))
    row("Single Stranded Consensus Sequence:", str(post.sscs_num))
    row("Duplex Consensus Sequence:", str(post.dcs_num))
    h.append("</table></div>")

    h.append("<div class='subsection_title' onclick=showOrHide('filtering_metrics')>Details</div>")
    h.append("<div id='filtering_metrics'><table class='summary_table'>")
    trow("", "before processing", "after processing")
    trow("total bases:", _format_number(pre.base), _format_number(post.base))
    trow("mapped bases:", _format_number(pre.mapped_bases()), _format_number(post.mapped_bases()))
    trow("total reads:", _format_number(pre.read), _format_number(post.read))
    trow("mapped reads:", _format_number(pre.mapped_reads()), _format_number(post.mapped_reads()))
    trow("mismatched bases:", _format_number(pre.base_mismatches), _format_number(post.base_mismatches))
    trow("reads with mismatched bases:", _format_number(pre.read_with_mismatches),
         _format_number(post.read_with_mismatches))
    trow("mismatch rate:", _to_string(pre.mismatch_rate()), _to_string(post.mismatch_rate()))
    trow("total mapping clusters:", _format_number(pre.cluster), _format_number(post.cluster))
    trow("multiple fragments clusters:", _format_number(pre.multi_molecule_cluster),
         _format_number(post.multi_molecule_cluster))
    trow("total fragments:", _format_number(pre.molecule), _format_number(post.molecule))
    trow("single-end fragments:", _format_number(pre.molecule_se), _format_number(post.molecule_se))
    trow("paired-end fragments:", _format_number(pre.molecule_pe), _format_number(post.molecule_pe))
    h.append("</table></div></div></div>")

    # duplication histogram (htmlreporter.cpp:354-403)
    h.append("<div class='section_div'>")
    h.append("<div class='section_title' onclick=showOrHide('duplication')><a name='duplication'>Duplication histogram of mapped reads</a></div>")
    h.append("<div id='duplication'>")
    hist = pre.supporting_histogram
    total = MAX_SUPPORTING_READS - 1
    while total > 0 and hist[total] == 0:
        total -= 1
    if total == 0:
        total = 1
    x = list(range(1, total + 1))
    all_count = float(pre.uncounted_supporting_reads) + float(hist[1:total + 1].sum())
    percents = [float(hist[i]) * 100.0 / all_count if all_count > 0 else 0.0 for i in x]
    uncounted_pct = (100.0 * pre.uncounted_supporting_reads / all_count) if all_count > 0 else 0.0
    h.append("<div id='duplication_figure'><div class='figure' id='plot_duplication' style='height:400px;'></div></div>")
    h.append('<script type="text/javascript">')
    h.append("var data=[{type:'bar',x:[%s],y:[%s],name: 'Read percent (%%)  '}];" %
             (",".join(map(str, x)), ",".join(_to_string(p) for p in percents)))
    h.append("var layout={title:'%s %% fragments have %d+ duplicated reads', xaxis:{title:'duplication level'}, yaxis:{title:'Fragment percent (%%)'}};" %
             (_to_string(uncounted_pct), MAX_SUPPORTING_READS))
    h.append("Plotly.newPlot('plot_duplication', data, layout);</script>")
    h.append("</div></div>")

    # genome coverage mirror plots (htmlreporter.cpp:168-237)
    h.append("<div class='section_div'>")
    h.append("<div class='section_title' onclick=showOrHide('coverage')><a name='coverage'>Coverage statistics in genome scale</a></div>")
    h.append("<div id='coverage'>")
    h.append("<div style='padding:5px;'><center><table style='border:0px;'><tr><td style='width:20px;background:red'></td><td style='border:0px;'>Before processing</td><td style='width:20px;background:blue'></td><td style='border:0px;'>After processing</td></tr></table></center></div>")
    depths = pre.genome_depth
    maxpos = max((len(d) for d in depths), default=0)
    ceiling = _y_ceiling(depths, 500) / opt.coverage_step if depths else 0
    for c, name in enumerate(pre.target_names):
        d = depths[c]
        if len(d) * 100 < maxpos:
            continue
        w = 5.0 + 95.0 * len(d) / maxpos
        xs = _series([i * opt.coverage_step for i in range(len(d))])
        yb = _series([float(v) / opt.coverage_step for v in d])
        ya = _series([-float(v) / opt.coverage_step for v in post.genome_depth[c]])
        h.append(f"<div class='coverage_div' id='coverage_{name}'>")
        h.append(f"<div class='coverage_figure' id='plot_coverage_{name}' style='width:{_to_string(w)}%;height:80px;'></div></div>")
        h.append('<script type="text/javascript">')
        h.append("var data=[{x:[%s],y:[%s],name: 'before processing',fill: 'tozeroy',line:{color:'rgb(255,0, 0)', width:1}},"
                 "{x:[%s],y:[%s],name: 'after processing',fill: 'tozeroy',line:{color:'rgb(0, 0, 255)', width:1}}];"
                 % (xs, yb, xs, ya))
        h.append("var layout={margin: {l: 50,r: 50,b:30,t: 5,pad: 2}, showlegend: false, yaxis:{title:'%s', range:[%s, %s]}};"
                 % (name, _to_string(-ceiling), _to_string(ceiling)))
        h.append(f"Plotly.newPlot('plot_coverage_{name}', data, layout);</script>")
    h.append("</div></div>")

    # BED coverage (htmlreporter.cpp:239-303)
    if opt.has_bed_file and pre.bed_stats is not None:
        h.append("<div class='section_div'>")
        h.append(f"<div class='section_title' onclick=showOrHide('coverage_bed')><a name='coverage_bed'>Coverage statistics in BED:<font size=-2>{opt.bed_file}</font> </a></div>")
        h.append("<div id='coverage_bed'>")
        pre_bed = pre.bed_stats.contig_regions
        post_bed = post.bed_stats.contig_regions
        maxpos = max((len(r) for r in pre_bed), default=0)
        c1 = _y_ceiling([[r.avg_depth() for r in regs] for regs in pre_bed if regs], 500)
        c2 = _y_ceiling([[r.avg_depth() for r in regs] for regs in post_bed if regs], 500)
        for c, name in enumerate(pre.target_names):
            regs = pre_bed[c]
            if not regs:
                continue
            w = 5.0 + 95.0 * max(maxpos / 100.0, float(len(regs))) / maxpos
            px = ",".join(f'"{r.name} {r.start}-{r.end}"' for r in regs)
            pyb = ",".join(f'"{r.avg_depth()}"' for r in regs)
            pya = ",".join(f'"{-r.avg_depth()}"' for r in post_bed[c])
            h.append(f"<div class='bed_coverage_div' id='bed_coverage_{name}'>")
            h.append(f"<div class='coverage_figure' id='bed_plot_coverage_{name}' style='width:{_to_string(w)}%;height:250px;'></div></div>")
            h.append('<script type="text/javascript">')
            h.append("var data=[{x:[%s],y:[%s],name: 'before processing',fill: 'tozeroy',line:{color:'rgb(255,0, 0)', width:1}},"
                     "{x:[%s],y:[%s],name: 'after processing',fill: 'tozeroy',line:{color:'rgb(0, 0, 255)', width:1}}];"
                     % (px, pyb, px, pya))
            h.append("var layout={margin: {l: 50,r: 50,b: 150,t:5,pad: 2}, xaxis:{tickangle:60, tickfont:{size: 8,color: '#bc6f98'}}, showlegend: false, yaxis:{title:'%s', range:[%s, %s]}};"
                     % (name, str(-int(c2)), str(int(c1))))
            h.append(f"Plotly.newPlot('bed_plot_coverage_{name}', data, layout);</script>")
        h.append("</div></div>")

    h.append("</div>")
    h.append(f"<div id='footer'> <p>{command}</p>gencore-tpu {__version__}, at {now} </div>")
    h.append("</body></html>")
    with open(path, "w") as f:
        f.write("\n".join(h))
