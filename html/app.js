/* SyzgyDB TPU management UI — dependency-free SPA.
   REST wrappers mirror the reference's html/api.js surface. */

const api = {
  async req(method, path, body) {
    const opts = { method, headers: { "Content-Type": "application/json" } };
    if (body !== undefined) opts.body = JSON.stringify(body);
    const r = await fetch(path, opts);
    if (!r.ok) throw new Error(await r.text());
    return r.json();
  },
  listCollections: () => api.req("GET", "/api/v1/collections"),
  createCollection: (o) => api.req("POST", "/api/v1/collections", o),
  getCollection: (n) => api.req("GET", `/api/v1/collections/${n}`),
  deleteCollection: (n) => api.req("DELETE", `/api/v1/collections/${n}`),
  search: (n, body) => api.req("POST", `/api/v1/collections/${n}/search`, body),
};

const app = document.getElementById("app");
const crumb = document.getElementById("crumb");

function route() {
  const hash = location.hash.slice(1);
  if (hash.startsWith("/collection/")) {
    renderCollection(decodeURIComponent(hash.slice("/collection/".length)));
  } else {
    renderHome();
  }
}
window.addEventListener("hashchange", route);

/* ---------------- home: collections list ---------------- */

async function renderHome() {
  crumb.textContent = "";
  let cols = [];
  try { cols = await api.listCollections(); }
  catch (e) { app.innerHTML = `<div class="card">Server error: ${e}</div>`; return; }
  const rows = cols.map(c => `
    <tr class="rowlink" onclick="location.hash='/collection/${encodeURIComponent(c.name)}'">
      <td>${c.name}</td><td>${c.document_count}</td>
      <td>${c.dimension_count}</td><td>${c.quantization}-bit</td>
      <td>${c.distance_method}</td>
      <td>${fmtBytes(c.storage_size)}</td>
      <td>${c.average_distance.toFixed(4)}</td>
    </tr>`).join("");
  app.innerHTML = `
    <div class="card">
      <div class="row" style="justify-content:space-between; margin-bottom:10px">
        <h2 style="margin:0; font-size:15px">Collections</h2>
        <button onclick="createModal.showModal()">+ New collection</button>
      </div>
      ${cols.length ? `<table><thead><tr>
        <th>Name</th><th>Docs</th><th>Dims</th><th>Quant</th>
        <th>Distance</th><th>Storage</th><th>Avg dist</th>
      </tr></thead><tbody>${rows}</tbody></table>`
      : `<div class="empty">No collections yet.</div>`}
    </div>`;
}

async function doCreate() {
  try {
    await api.createCollection({
      name: cName.value.trim(),
      vector_size: parseInt(cDims.value, 10),
      quantization: parseInt(cQuant.value, 10),
      distance_function: cDist.value,
    });
    createModal.close();
    renderHome();
  } catch (e) { alert(e); }
}

/* ---------------- collection view ---------------- */

let searchTimer = null;
/* listing-mode pagination (reference: CollectionView.js:27-54 pages
   through records; the REST layer already honors offset/limit) */
let listPage = 0;
let listTotal = 0;
const PAGE_SIZE = 50;

async function renderCollection(name) {
  crumb.innerHTML = `<a href="#">collections</a> / ${name}`;
  let info;
  try { info = await api.getCollection(name); }
  catch (e) { app.innerHTML = `<div class="card">${e}</div>`; return; }
  listPage = 0;
  listTotal = info.document_count;
  app.innerHTML = `
    <div class="card">
      <div class="row" style="justify-content:space-between">
        <div class="stat">
          <b>${info.document_count}</b> docs ·
          <b>${info.dimension_count}</b> dims ·
          <b>${info.quantization}</b>-bit ·
          <b>${info.distance_method}</b> ·
          ${fmtBytes(info.storage_size)}
        </div>
        <button class="danger" onclick="dropCollection('${name}')">Delete collection</button>
      </div>
    </div>
    <div class="card">
      <div class="row">
        <input id="q" class="grow"
               placeholder="text query, or comma-separated vector">
        <label class="stat">precision <select id="precision">
          <option value="">medium</option>
          <option value="high">high</option>
          <option value="exact">exact</option>
        </select></label>
        <button onclick="runSearch('${name}')">Search</button>
      </div>
      <div class="stat" id="searchStats" style="margin-top:8px"></div>
      <div id="results"></div>
    </div>`;
  document.getElementById("q").addEventListener("input", () => {
    clearTimeout(searchTimer);                 // 500 ms debounce
    searchTimer = setTimeout(() => runSearch(name), 500);
  });
  runSearch(name);  // initial listing
}

async function runSearch(name) {
  const qEl = document.getElementById("q");
  if (!qEl) return;
  const q = qEl.value.trim();
  const precision = document.getElementById("precision").value;
  const body = {};
  if (q) {
    const parts = q.split(",").map(s => parseFloat(s));
    if (parts.length > 1 && parts.every(p => !isNaN(p))) body.vector = parts;
    else body.text = q;
    body.k = 100;
    if (precision) body.precision = precision;
  } else {
    body.offset = listPage * PAGE_SIZE;
    body.limit = PAGE_SIZE;
    // refresh the total per page so paging stays correct after
    // concurrent inserts/deletes (stale totals disabled "next" wrongly)
    try { listTotal = (await api.getCollection(name)).document_count; }
    catch (e) { /* keep the last-known total */ }
  }
  let res;
  try { res = await api.search(name, body); }
  catch (e) {
    document.getElementById("results").innerHTML =
      `<div class="empty">${e}</div>`;
    return;
  }
  const pages = Math.max(1, Math.ceil(listTotal / PAGE_SIZE));
  const first = listPage * PAGE_SIZE;
  document.getElementById("searchStats").innerHTML = q ?
    `searched <b>${res.percent_searched.toFixed(1)}%</b> of collection in ` +
    `<b>${res.search_time}ms</b>` +
    (res.embedding_time ? ` (embedding <b>${res.embedding_time}ms</b>)` : "")
    : `documents <b>${Math.min(first + 1, listTotal)}&ndash;` +
      `${first + res.results.length}</b> of <b>${listTotal}</b> (by id) ` +
      `<button id="pgPrev" ${listPage === 0 ? "disabled" : ""}>&larr; prev` +
      `</button> page ${listPage + 1}/${pages} ` +
      `<button id="pgNext" ${listPage + 1 >= pages ? "disabled" : ""}>` +
      `next &rarr;</button>`;
  if (!q) {
    const prev = document.getElementById("pgPrev");
    const next = document.getElementById("pgNext");
    if (prev) prev.onclick = () => { listPage--; runSearch(name); };
    if (next) next.onclick = () => { listPage++; runSearch(name); };
  }
  const rows = res.results.map(r => `
    <tr><td>${r.id}</td>
        <td class="dist">${q ? r.distance.toFixed(6) : ""}</td>
        <td class="meta">${escapeHtml(JSON.stringify(r.metadata))}</td></tr>`)
    .join("");
  document.getElementById("results").innerHTML = res.results.length ?
    `<table><thead><tr><th>ID</th><th>Distance</th><th>Metadata</th></tr>
     </thead><tbody>${rows}</tbody></table>`
    : `<div class="empty">No results.</div>`;
}

async function dropCollection(name) {
  if (!confirm(`Delete collection "${name}"?`)) return;
  await api.deleteCollection(name);
  location.hash = "";
}

/* ---------------- helpers ---------------- */

function fmtBytes(n) {
  if (n < 1024) return `${n} B`;
  if (n < 1048576) return `${(n / 1024).toFixed(1)} KB`;
  if (n < 1073741824) return `${(n / 1048576).toFixed(1)} MB`;
  return `${(n / 1073741824).toFixed(2)} GB`;
}

function escapeHtml(s) {
  return s.replace(/[&<>"']/g,
    c => ({ "&": "&amp;", "<": "&lt;", ">": "&gt;",
            '"': "&quot;", "'": "&#39;" }[c]));
}

route();
