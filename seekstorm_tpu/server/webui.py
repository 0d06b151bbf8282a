"""Embedded web UI: instant search with facets, sorting and paging
(own implementation of the reference's embedded UI capability,
reference seekstorm_server/web/ — served at GET /)."""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>seekstorm-tpu</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  :root { --fg:#1a1d21; --mut:#6b7280; --line:#e5e7eb; --acc:#2563eb; }
  * { box-sizing: border-box; }
  body { margin:0; font:15px/1.5 system-ui, sans-serif; color:var(--fg); }
  header { display:flex; gap:.75rem; align-items:center; padding:.8rem 1.2rem;
           border-bottom:1px solid var(--line); flex-wrap:wrap; }
  header h1 { font-size:1.05rem; margin:0 1rem 0 0; }
  input, select { font:inherit; padding:.45rem .6rem; border:1px solid var(--line);
           border-radius:6px; }
  #q { flex:1; min-width:16rem; }
  main { display:flex; gap:2rem; padding:1.2rem; max-width:70rem; margin:auto; }
  #facets { width:15rem; flex:none; }
  #facets h3 { font-size:.8rem; text-transform:uppercase; color:var(--mut);
               margin:.8rem 0 .3rem; }
  #facets label { display:flex; justify-content:space-between; cursor:pointer; }
  #facets .cnt { color:var(--mut); }
  #results { flex:1; }
  .hit { padding:.7rem 0; border-bottom:1px solid var(--line); }
  .hit .id { color:var(--mut); font-size:.8rem; }
  .hit b { background:#fde68a; font-weight:600; }
  #stats { color:var(--mut); font-size:.85rem; margin-bottom:.6rem; }
  #sugg { color:var(--acc); font-size:.85rem; }
  button { font:inherit; padding:.4rem .8rem; border:1px solid var(--line);
           background:#fff; border-radius:6px; cursor:pointer; }
</style>
</head>
<body>
<header>
  <h1>seekstorm-tpu</h1>
  <input id="apikey" placeholder="apikey" size="18">
  <input id="index" placeholder="index id" size="6" value="0">
  <select id="mode">
    <option value="Lexical">lexical</option>
    <option value="Hybrid">hybrid</option>
  </select>
  <select id="qtype">
    <option value="Intersection">AND</option>
    <option value="Union">OR</option>
  </select>
  <input id="q" placeholder="search…" autofocus>
</header>
<main>
  <aside id="facets"></aside>
  <section id="results">
    <div id="stats"></div>
    <div id="sugg"></div>
    <div id="hits"></div>
    <p><button id="more" hidden>more</button></p>
  </section>
</main>
<script>
const $ = s => document.querySelector(s);
let offset = 0, facetFields = [], activeFilters = {}, schema = [];
for (const k of ["apikey","index"]) {
  $("#"+k).value = localStorage.getItem("st_"+k) || $("#"+k).value;
  $("#"+k).addEventListener("change", e => {
    localStorage.setItem("st_"+k, e.target.value); loadSchema().then(search);
  });
}
async function api(path, body, method="POST") {
  const r = await fetch(`/api/v1/index/${$("#index").value}${path}`, {
    method, headers: {apikey: $("#apikey").value,
                      "Content-Type": "application/json"},
    body: body ? JSON.stringify(body) : undefined});
  if (!r.ok) throw new Error((await r.json()).error || r.status);
  return r.json();
}
async function loadSchema() {
  try {
    const info = await api("", null, "GET");
    schema = info.schema || [];
    facetFields = schema.filter(f => f.facet).map(f => f.field);
    $("#stats").textContent =
      `${info.indexed_doc_count} docs · ${info.term_count} terms`;
  } catch (e) { $("#stats").textContent = e.message; }
}
function req(extraLen) {
  const filters = Object.entries(activeFilters)
    .filter(([_, vs]) => vs.size)
    .map(([f, vs]) => ({field: f, values: [...vs]}));
  return {
    query: $("#q").value, offset, length: 10 + (extraLen||0),
    realtime: true, query_type_default: $("#qtype").value,
    search_mode: $("#mode").value,
    highlights: schema.filter(f => f.store && f.field_type === "Text")
                      .map(f => ({field: f.field, fragment_size: 200})),
    query_facets: facetFields.map(f => ({field: f, length: 8})),
    facet_filter: filters,
  };
}
function render(r, append) {
  if (!append) $("#hits").innerHTML = "";
  $("#stats").textContent =
    `${r.count_total} results · ${(r.time/1e6).toFixed(2)} ms`;
  $("#sugg").textContent = r.suggestions?.length
    ? "suggestions: " + r.suggestions.join(", ") : "";
  for (const hit of r.results) {
    const div = document.createElement("div");
    div.className = "hit";
    const hl = hit._highlights || {};
    let body = "";
    for (const f of schema.filter(f => f.store)) {
      const v = hl[f.field] ?? hit[f.field];
      if (typeof v === "string" && v) body += `<div>${v}</div>`;
    }
    div.innerHTML = `<div class="id">#${hit._id} · ${
      hit._score.toFixed(3)}</div>${body}`;
    $("#hits").appendChild(div);
  }
  $("#more").hidden = r.results.length < 10;
  const side = $("#facets"); side.innerHTML = "";
  for (const [field, vals] of Object.entries(r.facets || {})) {
    const h = document.createElement("h3"); h.textContent = field;
    side.appendChild(h);
    for (const [val, cnt] of vals) {
      const lab = document.createElement("label");
      const cb = document.createElement("input");
      cb.type = "checkbox";
      cb.checked = activeFilters[field]?.has(val);
      cb.onchange = () => {
        activeFilters[field] = activeFilters[field] || new Set();
        cb.checked ? activeFilters[field].add(val)
                   : activeFilters[field].delete(val);
        offset = 0; search();
      };
      lab.append(cb, ` ${val} `);
      const c = document.createElement("span");
      c.className = "cnt"; c.textContent = cnt;
      lab.appendChild(c);
      side.appendChild(lab);
    }
  }
}
let timer;
async function search(append) {
  try { render(await api("/query", req()), append); }
  catch (e) { $("#stats").textContent = e.message; }
}
$("#q").addEventListener("input", () => {
  offset = 0; clearTimeout(timer); timer = setTimeout(() => search(), 150);
});
for (const id of ["mode","qtype"])
  $("#"+id).addEventListener("change", () => { offset = 0; search(); });
$("#more").onclick = () => { offset += 10; search(true); };
loadSchema();
</script>
</body>
</html>
"""
