/* sph-pie-tpu operations console.
 *
 * Structural counterpart of the reference SPA
 * (sphereisaiahmin-dev/sph-pie public/app.js): central state + apiRequest
 * wrapper with 401/423 traps (app.js:6217-6247), view switching via
 * body.view-* classes (:5346), notify-then-refetch live sync (:1966 — here
 * over SSE instead of BroadcastChannel), archive analytics chart with
 * metric toggles / two selection modes / filters / day drilldown
 * (:2082-4167 — hand-rolled SVG, no CDN), calendar month grid (:3008),
 * admin user directory (:832-1081), config drawer + webhook preview
 * (:5431-6003), 5-minute idle logout + unload beacon (:6249-6324).
 */

const $ = (id) => document.getElementById(id);
const IDLE_LOGOUT_MS = 5 * 60 * 1000;

const state = {
  user: null,
  config: null,
  scenes: [],
  runs: [],
  archived: [],
  analytics: null,
  metricsOn: new Set(["kinetic_energy_avg", "max_speed"]),
  selMode: "range",
  pickedRuns: new Set(),
  currentRunId: null,
  calMonth: null, // Date of first of month
  calendarEvents: [],
  roleKeys: [],
  users: [],
  defaultTempPassword: "",
  es: null,
  idleTimer: null,
};

/* Metric definitions (reference ARCHIVE_METRIC_DEFS, app.js:21-86): color,
   y-axis class, display decimals, optional hard scale bounds. Metrics that
   share an axis class share one REAL y-scale on the chart (the reference's
   per-metric axis assignment, app.js:3719-3753) instead of each series
   being normalised to its own 0-1 overlay. */
const METRIC_DEFS = {
  runs:               { color: "#8fa3c4", axis: "count",   decimals: 0, min: 0 },
  samples:            { color: "#6a7d9e", axis: "count",   decimals: 0, min: 0 },
  kinetic_energy_avg: { color: "#4f8ef7", axis: "energy",  decimals: 4, min: 0 },
  kinetic_energy_max: { color: "#7fb0ff", axis: "energy",  decimals: 4, min: 0 },
  max_speed:          { color: "#38c6a0", axis: "speed",   decimals: 3, min: 0 },
  mean_density_avg:   { color: "#e8b339", axis: "density", decimals: 1 },
  max_density:        { color: "#f2d074", axis: "density", decimals: 1 },
  n_active_max:       { color: "#b37fe8", axis: "count",   decimals: 0, min: 0 },
  momentum_drift:     { color: "#e86060", axis: "drift",   decimals: 5, min: 0 },
};
const mdef = (m) => METRIC_DEFS[m] || { color: "#8fa3c4", axis: m, decimals: 3 };
const fmtMetric = (m, v) => typeof v === "number"
  ? v.toFixed(mdef(m).decimals ?? 3) : "–";

/* Issue taxonomy for manual step logging (the reference ISSUE_MAP analogue,
   public/app.js:1-12 — primary issue -> sub-issues), recast for the
   simulation domain. */
const ISSUE_MAP = {
  "instability": ["pressure blow-up", "velocity spike", "NaN/Inf state", "time-step too large"],
  "boundary": ["wall penetration", "leak at corner", "ghost-layer gap", "obstacle tunnelling"],
  "neighbor-grid": ["cell overflow", "skin violation", "stale bins", "halo mismatch"],
  "mass-conservation": ["particle loss", "duplicate emission", "sink overdrain"],
  "density-field": ["under-density at surface", "over-compression", "clumping"],
  "performance": ["step-time regression", "rebin storm", "memory pressure", "compile churn"],
  "rendering": ["frame artifact", "splat saturation", "missing frame"],
  "hardware": ["device OOM", "interconnect stall", "preemption"],
  "io": ["checkpoint failure", "export mismatch", "feed unavailable"],
  "other": ["unclassified"],
};

/* ---------------- api wrapper (401 -> login, 423 -> reset) -------------- */

async function api(method, path, body) {
  const resp = await fetch(path, {
    method,
    headers: body !== undefined ? { "Content-Type": "application/json" } : {},
    body: body !== undefined ? JSON.stringify(body) : undefined,
  });
  if (resp.status === 401) { showLogin(); throw new Error("unauthorized"); }
  if (resp.status === 423) { showReset(); throw new Error("password reset required"); }
  const ct = resp.headers.get("Content-Type") || "";
  const data = ct.includes("json") ? await resp.json() : await resp.text();
  if (!resp.ok) throw new Error(data.error || resp.statusText);
  return data;
}

function toast(msg, isError = false) {
  const t = $("toast");
  t.textContent = msg;
  t.className = isError ? "err" : "";
  t.style.display = "block";
  clearTimeout(t._h);
  t._h = setTimeout(() => (t.style.display = "none"), 3000);
}

function esc(s) {
  return String(s ?? "").replace(/[&<>"']/g, (c) =>
    ({ "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;" }[c]));
}

function download(name, text, type) {
  const url = URL.createObjectURL(new Blob([text], { type }));
  const a = document.createElement("a");
  a.href = url; a.download = name; a.click();
  URL.revokeObjectURL(url);
}

/* ---------------- auth ---------------- */

function showLogin() { $("loginOverlay").classList.add("open"); }
function showReset() {
  $("loginOverlay").classList.remove("open");
  $("resetOverlay").classList.add("open");
}

async function refreshSession() {
  try {
    const { user } = await api("GET", "/api/auth/session");
    if (!user) { showLogin(); return; }
    state.user = user;
    if (user.needsPasswordReset) { showReset(); return; }
    onAuthenticated();
  } catch { showLogin(); }
}

$("loginForm").onsubmit = async (e) => {
  e.preventDefault();
  try {
    const { user } = await api("POST", "/api/auth/login", {
      email: $("loginEmail").value.trim(),
      password: $("loginPassword").value,
    });
    state.user = user;
    $("loginError").textContent = "";
    if (user.needsPasswordReset) showReset();
    else { $("loginOverlay").classList.remove("open"); onAuthenticated(); }
  } catch (err) { $("loginError").textContent = err.message; }
};

$("resetForm").onsubmit = async (e) => {
  e.preventDefault();
  try {
    await api("POST", "/api/auth/password", {
      currentPassword: $("resetCurrent").value,
      password: $("resetPassword").value,
    });
    $("resetOverlay").classList.remove("open");
    await refreshSession();
  } catch (err) { $("resetError").textContent = err.message; }
};

$("logoutBtn").onclick = async () => {
  try { await api("POST", "/api/auth/logout", {}); } catch {}
  location.reload();
};

function isAdmin() { return (state.user?.roles || []).includes("admin"); }

/* Idle auto-logout + unload beacon (reference: app.js:6249-6324). */
function resetIdleTimer() {
  clearTimeout(state.idleTimer);
  state.idleTimer = setTimeout(async () => {
    if (!state.user) return;
    try { await api("POST", "/api/auth/logout", {}); } catch {}
    location.reload();
  }, IDLE_LOGOUT_MS);
}
for (const ev of ["mousemove", "keydown", "click", "scroll", "touchstart"])
  addEventListener(ev, resetIdleTimer, { passive: true });
addEventListener("pagehide", () => {
  if (!state.user) return;
  if (navigator.sendBeacon) navigator.sendBeacon("/api/auth/logout", "{}");
  else fetch("/api/auth/logout", { method: "POST", keepalive: true, body: "{}" });
});

/* ---------------- boot ---------------- */

async function onAuthenticated() {
  $("userLine").textContent = `${state.user.name}`;
  $("navAdmin").hidden = !isAdmin();
  $("configBtn").hidden = !isAdmin();
  resetIdleTimer();
  await Promise.all([loadConfig(), loadScenes(), loadHealth()]);
  await Promise.all([loadRuns(), loadArchive()]);
  if (isAdmin()) loadUsers();
  setupSSE();
  renderAll();
}

async function loadConfig() {
  try { state.config = (await api("GET", "/api/config")).config; } catch {}
}
async function loadScenes() {
  state.scenes = (await api("GET", "/api/scenes")).scenes;
  for (const sel of [$("scene"), $("runScene")]) {
    sel.innerHTML = "";
    for (const s of state.scenes) {
      const o = document.createElement("option");
      o.value = s.id; o.textContent = s.id;
      sel.appendChild(o);
    }
  }
  const sf = $("sceneFilter");
  sf.innerHTML = '<option value="">all</option>' + state.scenes
    .map((s) => `<option>${esc(s.id)}</option>`).join("");
}
async function loadHealth() {
  try {
    const h = await api("GET", "/api/health");
    $("health").textContent = JSON.stringify(h, null, 1);
    $("connLine").textContent =
      `${h.listen?.host}:${h.listen?.port} · ${h.device?.backend}×${h.device?.deviceCount}`;
    const sb = $("storageBadge");
    sb.textContent = h.storage?.provider || "?";
    sb.className = "badge ok";
    const wb = $("webhookBadge");
    wb.textContent = h.webhook?.enabled
      ? (h.webhook.verified ? "webhook ✓" : "webhook ?") : "webhook off";
    wb.title = h.webhook?.detail || "";
    wb.className = "badge " + (h.webhook?.enabled ? (h.webhook.verified ? "ok" : "err") : "");
  } catch {}
}

/* Notify-then-refetch: SSE messages carry no payload authority; receivers
   re-fetch canonical state (the reference's BroadcastChannel discipline). */
function setupSSE() {
  if (state.es) state.es.close();
  state.es = new EventSource("/api/events");
  state.es.onmessage = (e) => {
    $("events").textContent = (e.data + "\n" + $("events").textContent).slice(0, 1500);
    let msg = {};
    try { msg = JSON.parse(e.data); } catch {}
    if (msg.type === "runs:changed") { loadRuns(); loadArchive(); }
    if (msg.type === "config:changed") { loadConfig(); loadHealth(); }
  };
}

/* ---------------- view switching ---------------- */

function setView(v) {
  document.body.className = `view-${v}`;
  for (const b of document.querySelectorAll("#nav button"))
    b.classList.toggle("active", b.dataset.view === v);
  if (v === "calendar") loadCalendar();
  if (v === "archive") refreshAnalytics();
}
for (const b of document.querySelectorAll("#nav button"))
  b.onclick = () => setView(b.dataset.view);

function renderAll() { renderRuns(); renderArchiveTable(); refreshAnalytics(); }

/* ---------------- overview (scene preview) ---------------- */

let previewStep = 0, playing = false, previewTimer = null;
function previewTick() {
  if (!playing) return;
  previewStep += 25;
  $("frame").src =
    `/api/scenes/${$("scene").value}/preview.png?steps=${previewStep}&t=${Date.now()}`;
  $("stepLabel").textContent = `step ${previewStep}`;
  previewTimer = setTimeout(previewTick, 350);
}
$("play").onclick = () => {
  playing = !playing;
  $("play").textContent = playing ? "pause" : "play";
  if (playing) previewTick(); else clearTimeout(previewTimer);
};
$("scene").onchange = () => { previewStep = 0; };

/* ---------------- runs ---------------- */

async function loadRuns() {
  try { state.runs = (await api("GET", "/api/runs")).runs; renderRuns(); } catch {}
}

function renderRuns() {
  $("runRows").innerHTML = state.runs.map((r) => `
    <tr data-id="${esc(r.id)}" class="${r.id === state.currentRunId ? "sel" : ""}">
      <td>${esc(r.runDate)}</td><td>${esc(r.name)}</td><td>${esc(r.scene)}</td>
      <td><span class="pill ${esc(r.status || "")}">${esc(r.status || "logged")}</span></td>
      <td>${(r.steps || []).length}</td>
      <td><button data-menu="1" data-id="${esc(r.id)}">⋮</button></td>
    </tr>`).join("");
  renderRunDetail();
}

/* Per-row ⋮ menu (reference: createShowMenu, app.js:4891) + duplicate-run
   flow (duplicateShow, app.js:4588). */
const MENU_ACTIONS = [
  ["exec", "execute"], ["dup", "duplicate"], ["archive", "archive"],
  ["csv", "export csv"], ["json", "export json"], ["delete", "delete"],
];
function openRowMenu(btn, id) {
  const menu = $("rowMenu");
  menu.innerHTML = MENU_ACTIONS.map(([act, label]) =>
    `<button data-act="${act}" data-id="${esc(id)}"
       class="${act === "delete" ? "danger" : ""}">${label}</button>`).join("");
  const r = btn.getBoundingClientRect();
  menu.style.left = Math.max(8, r.right - 130 + scrollX) + "px";
  menu.style.top = (r.bottom + 4 + scrollY) + "px";
  menu.classList.add("open");
}
addEventListener("click", (e) => {
  if (!e.target.closest("#rowMenu") && !e.target.closest("[data-menu]"))
    $("rowMenu").classList.remove("open");
});

async function runAction(act, id) {
  try {
    if (act === "exec") {
      const steps = parseInt($("runSteps").value || "200", 10);
      await api("POST", `/api/runs/${id}/execute`, { steps });
      toast("run queued");
    } else if (act === "dup") {
      const src = state.runs.find((r) => r.id === id);
      if (!src) return;
      const copy = await api("POST", "/api/runs", {
        name: `${src.name} (copy)`, scene: src.scene, runDate: src.runDate,
        ...(src.params ? { params: src.params } : {}),
      });
      state.currentRunId = copy.run?.id || null;
      toast("run duplicated");
    } else if (act === "archive") {
      await api("POST", `/api/runs/${id}/archive`, {});
      toast("archived");
    } else if (act === "csv" || act === "json") {
      const data = await api("GET", `/api/runs/${id}/export?format=${act}`);
      const text = typeof data === "string" ? data : JSON.stringify(data, null, 1);
      download(`run-${id}.${act}`, text, act === "csv" ? "text/csv" : "application/json");
      return;
    } else if (act === "delete") {
      await api("DELETE", `/api/runs/${id}`);
      if (state.currentRunId === id) state.currentRunId = null;
      toast("deleted (kept in archive)");
    }
    await loadRuns(); await loadArchive();
  } catch (err) { toast(err.message, true); }
}

$("runRows").onclick = (e) => {
  const btn = e.target.closest("button");
  if (btn && btn.dataset.menu) { openRowMenu(btn, btn.dataset.id); return; }
  const tr = e.target.closest("tr[data-id]");
  if (tr) { state.currentRunId = tr.dataset.id; renderRuns(); }
};
$("rowMenu").onclick = (e) => {
  const btn = e.target.closest("button"); if (!btn) return;
  $("rowMenu").classList.remove("open");
  runAction(btn.dataset.act, btn.dataset.id);
};

/* ---------------- manual step logging (C8) + edit modal (C9) ----------- */

function currentRun() {
  return state.runs.find((r) => r.id === state.currentRunId) || null;
}

/* Client mirror of rbac.is_operator_only: such users get the operator
   field locked to their own identity (the server forces it regardless —
   service/api.py ep_step_create). */
function isOperatorOnlyClient() {
  const roles = state.user?.roles || [];
  if (roles.includes("admin")) return false;
  const levels = roles.map((r) => r.split(".")[1]);
  return levels.includes("operator") && !levels.includes("lead");
}

let stepStatusVal = "ok";
function bindStatusPills(groupEl, onChange) {
  groupEl.onclick = (e) => {
    const b = e.target.closest("button"); if (!b) return;
    for (const x of groupEl.querySelectorAll("button"))
      x.classList.toggle("on", x === b);
    onChange(b.dataset.v);
  };
}
bindStatusPills($("stepStatus"), (v) => { stepStatusVal = v; syncIssueBlock(); });

/* Status ↔ issue coupling (the planned/launched ↔ status coupling
   analogue, reference app.js:4248-4260): an "ok" step cannot carry an
   issue; warn/fail require one. */
function syncIssueBlock() {
  const need = stepStatusVal !== "ok";
  $("issueBlock").style.display = need ? "" : "none";
  if (!need) { $("stepIssue").value = ""; $("stepSubIssue").innerHTML = ""; }
}

function fillIssueSelect(sel, value) {
  sel.innerHTML = '<option value="">select…</option>' +
    Object.keys(ISSUE_MAP).map((k) =>
      `<option${k === value ? " selected" : ""}>${esc(k)}</option>`).join("");
}
function fillSubIssueSelect(sel, issue, value) {
  const subs = ISSUE_MAP[issue] || [];
  sel.innerHTML = subs.map((s) =>
    `<option${s === value ? " selected" : ""}>${esc(s)}</option>`).join("");
}
$("stepIssue").onchange = () => fillSubIssueSelect($("stepSubIssue"), $("stepIssue").value);

function renderRunDetail() {
  const run = currentRun();
  $("runDetail").style.display = run ? "" : "none";
  if (!run) return;
  $("runDetailTitle").textContent = `${run.name} · ${run.scene} · ${run.runDate}`;
  const steps = [...(run.steps || [])].sort((a, b) => (a.step ?? 0) - (b.step ?? 0));
  $("stepRows").innerHTML = steps.map((s) => `
    <tr>
      <td>${s.step ?? ""}</td><td>${esc(s.operator || "")}</td>
      <td><span class="pill ${esc(s.status || "")}">${esc(s.status || "ok")}</span></td>
      <td>${esc(s.issue ? `${s.issue}${s.subIssue ? " / " + s.subIssue : ""}` : "")}</td>
      <td>${fmtNum(s.kinetic_energy)}</td><td>${fmtNum(s.max_speed)}</td>
      <td class="muted">${s.recordedAt ? new Date(s.recordedAt).toLocaleTimeString() : ""}</td>
      <td><button data-act="edit" data-sid="${esc(s.id)}">✎</button>
          <button data-act="del" data-sid="${esc(s.id)}" class="danger">✕</button></td>
    </tr>`).join("");
  fillIssueSelect($("stepIssue"), $("stepIssue").value);
  const opInput = $("stepOperator");
  if (isOperatorOnlyClient()) {
    opInput.value = state.user.name;
    opInput.disabled = true;
    $("stepLockLine").textContent = "operator identity locked to your account";
  } else if (!opInput.value) opInput.value = state.user?.name || "";
  syncIssueBlock();
  // suggest the next unrecorded step index
  if (!$("stepIndex").value && steps.length)
    $("stepIndex").placeholder = String((steps[steps.length - 1].step ?? 0) + 1);
}

/* Shared validation + payload collection for the entry form and the edit
   modal (required fields, numeric coercion, status/issue coupling —
   reference app.js:4733-4755). `get(name)` returns the raw input string. */
function collectStepPayload(get, run, statusVal, excludeId) {
  const errors = {};
  const idxRaw = get("index").trim();
  const idx = Number(idxRaw);
  if (idxRaw === "" || !Number.isInteger(idx) || idx < 0)
    errors.stepIndex = "step index must be a whole number ≥ 0";
  else if ((run.steps || []).some((s) => s.step === idx && s.id !== excludeId))
    errors.stepIndex = `step ${idx} already recorded`;
  const operator = get("operator").trim();
  if (!operator) errors.stepOperator = "operator is required";
  const payload = { step: idx, operator, status: statusVal };
  if (statusVal !== "ok") {
    const issue = get("issue");
    if (!issue) errors.stepIssue = "issue is required for warn/fail";
    else { payload.issue = issue; payload.subIssue = get("subIssue"); }
  }
  for (const [name, key] of [["ke", "kinetic_energy"], ["vmax", "max_speed"],
                             ["rho", "mean_density"], ["nactive", "n_active"]]) {
    const raw = get(name).trim();
    if (!raw) continue;
    const v = Number(raw);
    if (!Number.isFinite(v)) errors.stepMetrics = `${key} must be numeric`;
    else payload[key] = v;
  }
  const notes = get("notes").trim();
  if (notes) payload.notes = notes;
  return { payload, errors };
}

function showStepErrors(errors) {
  for (const id of ["stepIndex", "stepOperator", "stepIssue", "stepMetrics"])
    $("err-" + id).textContent = errors[id] || "";
  return Object.keys(errors).length === 0;
}

$("stepForm").onsubmit = async (e) => {
  e.preventDefault();
  const run = currentRun(); if (!run) return;
  const { payload, errors } = collectStepPayload((n) => ({
    index: $("stepIndex").value, operator: $("stepOperator").value,
    issue: $("stepIssue").value, subIssue: $("stepSubIssue").value,
    ke: $("stepKE").value, vmax: $("stepVmax").value, rho: $("stepRho").value,
    nactive: $("stepNActive").value, notes: $("stepNotes").value,
  }[n]), run, stepStatusVal);
  if (!showStepErrors(errors)) return;
  try {
    await api("POST", `/api/runs/${run.id}/steps`, payload);
    toast(`step ${payload.step} logged`);
    for (const id of ["stepIndex", "stepKE", "stepVmax", "stepRho", "stepNActive", "stepNotes"])
      $(id).value = "";
    await loadRuns();
  } catch (err) { toast(err.message, true); }
};

$("stepRows").onclick = async (e) => {
  const btn = e.target.closest("button"); if (!btn) return;
  const run = currentRun(); if (!run) return;
  const step = (run.steps || []).find((s) => s.id === btn.dataset.sid);
  if (btn.dataset.act === "del") {
    try {
      await api("DELETE", `/api/runs/${run.id}/steps/${btn.dataset.sid}`);
      toast("step deleted");
      await loadRuns();
    } catch (err) { toast(err.message, true); }
  } else if (btn.dataset.act === "edit" && step) {
    openStepEditModal(run, step);
  }
};

/* Clone-based edit modal (reference: buildEntryFieldsClone + saveEditEntry,
   app.js:5049-5266): the field set is rebuilt from the entry each time. */
let editStatusVal = "ok";
function openStepEditModal(run, step) {
  editStatusVal = step.status || "ok";
  $("editStepId").value = step.id;
  const lock = isOperatorOnlyClient();
  $("stepEditFields").innerHTML = `
    <label class="muted">step index</label>
    <input id="edit-index" type="number" min="0" step="1" style="width:100%"
      value="${esc(step.step ?? "")}">
    <span class="field-error" id="err-editIndex"></span>
    <label class="muted">operator</label>
    <input id="edit-operator" style="width:100%" ${lock ? "disabled" : ""}
      value="${esc(lock ? state.user.name : (step.operator || ""))}">
    <label class="muted">status</label>
    <div class="pill-group" id="edit-status">
      ${["ok", "warn", "fail"].map((v) =>
        `<button type="button" data-v="${v}"
           class="${v === editStatusVal ? "on" : ""}">${v}</button>`).join("")}
    </div>
    <div id="edit-issueBlock" style="${editStatusVal === "ok" ? "display:none" : ""}">
      <label class="muted">issue</label>
      <select id="edit-issue" style="width:100%"></select>
      <label class="muted">detail</label>
      <select id="edit-subIssue" style="width:100%"></select>
    </div>
    <div class="metric-grid">
      <span><label class="muted">kinetic energy</label>
        <input id="edit-ke" type="number" step="any" value="${esc(step.kinetic_energy ?? "")}"></span>
      <span><label class="muted">max speed</label>
        <input id="edit-vmax" type="number" step="any" value="${esc(step.max_speed ?? "")}"></span>
      <span><label class="muted">mean density</label>
        <input id="edit-rho" type="number" step="any" value="${esc(step.mean_density ?? "")}"></span>
      <span><label class="muted">active particles</label>
        <input id="edit-nactive" type="number" min="0" step="1" value="${esc(step.n_active ?? "")}"></span>
    </div>
    <label class="muted">notes</label>
    <input id="edit-notes" style="width:100%" value="${esc(step.notes || "")}">`;
  fillIssueSelect($("edit-issue"), step.issue);
  fillSubIssueSelect($("edit-subIssue"), step.issue, step.subIssue);
  $("edit-issue").onchange = () =>
    fillSubIssueSelect($("edit-subIssue"), $("edit-issue").value);
  bindStatusPills($("edit-status"), (v) => {
    editStatusVal = v;
    $("edit-issueBlock").style.display = v === "ok" ? "none" : "";
  });
  $("stepEditError").textContent = "";
  $("stepEditModal").classList.add("open");
}
$("stepEditClose").onclick = () => $("stepEditModal").classList.remove("open");

$("stepEditForm").onsubmit = async (e) => {
  e.preventDefault();
  const run = currentRun(); if (!run) return;
  const { payload, errors } = collectStepPayload((n) => ({
    index: $("edit-index").value, operator: $("edit-operator").value,
    issue: $("edit-issue").value, subIssue: $("edit-subIssue").value,
    ke: $("edit-ke").value, vmax: $("edit-vmax").value, rho: $("edit-rho").value,
    nactive: $("edit-nactive").value, notes: $("edit-notes").value,
  }[n]), run, editStatusVal, $("editStepId").value);
  const msgs = Object.values(errors);
  $("stepEditError").textContent = msgs.join(" · ");
  if (msgs.length) return;
  try {
    await api("PUT", `/api/runs/${run.id}/steps/${$("editStepId").value}`, payload);
    $("stepEditModal").classList.remove("open");
    toast("step updated");
    await loadRuns();
  } catch (err) { $("stepEditError").textContent = err.message; }
};

$("runForm").onsubmit = async (e) => {
  e.preventDefault();
  try {
    const body = {
      name: $("runName").value.trim(),
      scene: $("runScene").value,
      runDate: $("runDate").value,
    };
    if ($("runSolver").value === "pbf") body.params = { solver: "pbf" };
    await api("POST", "/api/runs", body);
    $("runName").value = "";
    toast("run created");
    await loadRuns();
  } catch (err) { toast(err.message, true); }
};

/* ---------------- archive analytics ---------------- */

async function loadArchive() {
  try {
    state.archived = (await api("GET", "/api/runs/archive")).runs;
    renderArchiveTable();
    renderRunPicker();
  } catch {}
}

function renderArchiveTable() {
  $("archiveRows").innerHTML = state.archived.map((r) => `
    <tr>
      <td>${esc(r.runDate)}</td><td>${esc(r.name)}</td><td>${esc(r.scene)}</td>
      <td>${(r.steps || []).length}</td>
      <td>${r.archivedAt ? new Date(r.archivedAt).toLocaleString() : ""}</td>
      <td>
        <button data-fmt="csv" data-id="${esc(r.id)}">csv</button>
        <button data-fmt="json" data-id="${esc(r.id)}">json</button>
      </td>
    </tr>`).join("");
}

$("archiveRows").onclick = async (e) => {
  const btn = e.target.closest("button"); if (!btn) return;
  const fmt = btn.dataset.fmt;
  const data = await api("GET", `/api/runs/${btn.dataset.id}/export?format=${fmt}`);
  const text = typeof data === "string" ? data : JSON.stringify(data, null, 1);
  download(`run-${btn.dataset.id}.${fmt}`, text, fmt === "csv" ? "text/csv" : "application/json");
};

function renderRunPicker() {
  $("runSelectList").innerHTML = state.archived.map((r) => `
    <label><input type="checkbox" data-id="${esc(r.id)}"
      ${state.pickedRuns.has(r.id) ? "checked" : ""}>
      ${esc(r.runDate)} · ${esc(r.name)} (${esc(r.scene)})</label>`).join("");
}
$("runSelectList").onchange = (e) => {
  const cb = e.target;
  if (cb.checked) state.pickedRuns.add(cb.dataset.id);
  else state.pickedRuns.delete(cb.dataset.id);
  refreshAnalytics();
};

$("selMode").onchange = () => {
  state.selMode = $("selMode").value;
  $("rangeControls").style.display = state.selMode === "range" ? "" : "none";
  $("pickControls").style.display = state.selMode === "pick" ? "" : "none";
  refreshAnalytics();
};
$("archiveRefresh").onclick = () => { loadArchive().then(refreshAnalytics); };
for (const id of ["dateFrom", "dateTo", "sceneFilter", "operatorFilter"])
  $(id).onchange = refreshAnalytics;

async function refreshAnalytics() {
  const qs = new URLSearchParams();
  if (state.selMode === "range") {
    if ($("dateFrom").value) qs.set("from", $("dateFrom").value);
    if ($("dateTo").value) qs.set("to", $("dateTo").value);
  }
  if ($("sceneFilter").value) qs.set("scene", $("sceneFilter").value);
  if ($("operatorFilter").value) qs.set("operator", $("operatorFilter").value);
  try {
    state.analytics = await api("GET", `/api/runs/archive/analytics?${qs}`);
  } catch { return; }
  populateOperatorFilter();
  renderMetricToggles();
  renderChart();
}

function populateOperatorFilter() {
  const ops = new Set();
  for (const r of state.archived)
    for (const s of r.steps || []) if (s.operator) ops.add(s.operator);
  const sel = $("operatorFilter"), cur = sel.value;
  sel.innerHTML = '<option value="">all</option>' +
    [...ops].sort().map((o) => `<option>${esc(o)}</option>`).join("");
  sel.value = cur;
}

function renderMetricToggles() {
  const el = $("metricToggles");
  el.innerHTML = "";
  for (const m of Object.keys(state.analytics?.series || {})) {
    const b = document.createElement("button");
    b.textContent = m;
    b.style.color = mdef(m).color;
    b.className = state.metricsOn.has(m) ? "on" : "";
    b.onclick = () => {
      state.metricsOn.has(m) ? state.metricsOn.delete(m) : state.metricsOn.add(m);
      renderMetricToggles(); renderChart();
    };
    el.appendChild(b);
  }
}

/* In pick mode, rebuild the daily series client-side from the selected
   runs' per-run stats (the server groups payload carries them). */
function activeSeries() {
  const a = state.analytics;
  if (!a) return { dates: [], series: {} };
  if (state.selMode !== "pick" || state.pickedRuns.size === 0) return a;
  const dates = [], series = {};
  const metrics = Object.keys(a.series);
  for (const m of metrics) series[m] = [];
  for (const d of a.dates) {
    const rows = (a.groups[d] || []).filter((r) => state.pickedRuns.has(r.id));
    if (!rows.length) continue;
    dates.push(d);
    for (const m of metrics) {
      const vals = rows.map((r) => r.metrics[m]).filter((v) => typeof v === "number");
      if (!vals.length) series[m].push(null);
      else if (m === "runs" || m === "samples")
        series[m].push(vals.reduce((x, y) => x + y, 0));
      else series[m].push(vals.reduce((x, y) => x + y, 0) / vals.length);
    }
  }
  return { dates, series, groups: a.groups };
}

function renderChart() {
  const svg = $("chart");
  const { dates, series } = activeSeries();
  const W = svg.clientWidth || 800, H = 320;
  svg.setAttribute("viewBox", `0 0 ${W} ${H}`);
  svg.innerHTML = "";
  $("archiveSummary").textContent =
    `${state.analytics?.totalRuns ?? 0} archived runs · ${dates.length} day groups`;
  if (!dates.length) {
    svg.innerHTML = `<text x="${W / 2}" y="${H / 2}" fill="#7f8ca6"
      text-anchor="middle" font-size="13">no archived data in selection</text>`;
    return;
  }

  /* Per-axis-class REAL y-scales (reference: multi-axis assignment,
     app.js:3719-3753): every active metric maps onto the shared scale of
     its axis class; the first two active classes get labelled tick rails
     (left / right), further classes share the plot unlabelled. */
  const axes = [];  // [{cls, lo, hi, metrics: []}]
  for (const m of state.metricsOn) {
    const vals = (series[m] || []).filter((v) => typeof v === "number");
    if (!vals.length) continue;
    const d = mdef(m);
    let ax = axes.find((a) => a.cls === d.axis);
    if (!ax) { ax = { cls: d.axis, lo: Infinity, hi: -Infinity, metrics: [] }; axes.push(ax); }
    ax.metrics.push(m);
    ax.lo = Math.min(ax.lo, d.min ?? Math.min(...vals));
    ax.hi = Math.max(ax.hi, d.max ?? Math.max(...vals));
  }
  for (const ax of axes) if (ax.hi === ax.lo) { ax.hi = ax.lo + 1; }
  const PAD = { l: axes.length >= 1 ? 52 : 10, r: axes.length >= 2 ? 52 : 10, t: 14, b: 26 };

  const x = (i) => PAD.l + (dates.length === 1 ? (W - PAD.l - PAD.r) / 2
    : (i * (W - PAD.l - PAD.r)) / (dates.length - 1));
  const yOf = (ax, v) =>
    PAD.t + (1 - (v - ax.lo) / (ax.hi - ax.lo)) * (H - PAD.t - PAD.b);
  const ns = "http://www.w3.org/2000/svg";
  const text = (xp, yp, s, anchor, color) => {
    const t = document.createElementNS(ns, "text");
    t.setAttribute("x", xp); t.setAttribute("y", yp);
    t.setAttribute("fill", color || "#7f8ca6"); t.setAttribute("font-size", "10");
    t.setAttribute("text-anchor", anchor);
    t.textContent = s;
    svg.appendChild(t);
  };

  // x labels
  const every = Math.max(1, Math.ceil(dates.length / 10));
  for (let i = 0; i < dates.length; i += every)
    text(x(i), H - 8, dates[i].slice(5), "middle");

  // y tick rails for the first two axis classes
  const fmtTick = (ax, v) => {
    const dec = Math.max(...ax.metrics.map((m) => mdef(m).decimals ?? 3));
    const a = Math.abs(v);
    return a !== 0 && (a < 0.01 || a >= 1e5) ? v.toExponential(1) : v.toFixed(Math.min(dec, 4));
  };
  axes.slice(0, 2).forEach((ax, side) => {
    const color = mdef(ax.metrics[0]).color;
    const xp = side === 0 ? PAD.l - 6 : W - PAD.r + 6;
    const anchor = side === 0 ? "end" : "start";
    for (let k = 0; k <= 4; k++) {
      const v = ax.lo + (k / 4) * (ax.hi - ax.lo);
      const yp = yOf(ax, v);
      text(xp, yp + 3, fmtTick(ax, v), anchor, color);
      if (side === 0) {
        const ln = document.createElementNS(ns, "line");
        ln.setAttribute("x1", PAD.l); ln.setAttribute("x2", W - PAD.r);
        ln.setAttribute("y1", yp); ln.setAttribute("y2", yp);
        ln.setAttribute("stroke", "#243048"); ln.setAttribute("stroke-width", "1");
        svg.appendChild(ln);
      }
    }
    text(xp, PAD.t - 4, ax.cls, anchor, color);
  });

  for (const ax of axes) {
    for (const m of ax.metrics) {
      const vals = series[m];
      const y = (v) => yOf(ax, v);
      let dstr = "", pen = false;
      vals.forEach((v, i) => {
        if (typeof v !== "number") { pen = false; return; }
        dstr += `${pen ? "L" : "M"}${x(i).toFixed(1)},${y(v).toFixed(1)}`;
        pen = true;
      });
      const p = document.createElementNS(ns, "path");
      p.setAttribute("d", dstr);
      p.setAttribute("fill", "none");
      p.setAttribute("stroke", mdef(m).color);
      p.setAttribute("stroke-width", "2");
      svg.appendChild(p);
      vals.forEach((v, i) => {
        if (typeof v !== "number") return;
        const c = document.createElementNS(ns, "circle");
        c.setAttribute("cx", x(i)); c.setAttribute("cy", y(v)); c.setAttribute("r", 4);
        c.setAttribute("fill", mdef(m).color);
        c.style.cursor = "pointer";
        c.addEventListener("click", (ev) => openDayDetail(dates[i], ev));
        svg.appendChild(c);
      });
    }
  }
}

/* click-a-point day drilldown (reference: openArchiveDayDetail, app.js:2563) */
function openDayDetail(date, ev) {
  const rows = (state.analytics?.groups?.[date] || []);
  const dd = $("dayDetail");
  dd.innerHTML = `<h3>${esc(date)} <button style="float:right"
      onclick="this.closest('#dayDetail').classList.remove('open')">×</button></h3>` +
    rows.map((r) => `
      <div style="margin-bottom:8px">
        <b>${esc(r.name)}</b> <span class="muted">${esc(r.scene)}</span><br>
        <span class="muted">samples ${r.metrics.samples ?? 0} ·
        KE avg ${fmtMetric("kinetic_energy_avg", r.metrics.kinetic_energy_avg)} ·
        v_max ${fmtMetric("max_speed", r.metrics.max_speed)}</span>
      </div>`).join("");
  const wrap = $("chartWrap").getBoundingClientRect();
  dd.style.left = Math.min(ev.clientX - wrap.left + 10, wrap.width - 280) + "px";
  dd.style.top = (ev.clientY - wrap.top + 10) + "px";
  dd.classList.add("open");
}
window.fmtNum = (v) => typeof v === "number" ? (Math.abs(v) < 0.01 || Math.abs(v) > 9999 ? v.toExponential(2) : v.toFixed(3)) : "–";
const fmtNum = window.fmtNum;

/* ---------------- calendar month grid ---------------- */

async function loadCalendar() {
  try {
    state.calendarEvents = (await api("GET", "/api/calendar")).events || [];
  } catch (err) { $("calDetailLine").textContent = err.message; }
  renderCalendar();
}

$("calPrev").onclick = () => { shiftCalMonth(-1); };
$("calNext").onclick = () => { shiftCalMonth(1); };
function shiftCalMonth(d) {
  const m = state.calMonth || new Date();
  state.calMonth = new Date(m.getFullYear(), m.getMonth() + d, 1);
  renderCalendar();
}

function renderCalendar() {
  const now = new Date();
  const m = state.calMonth || new Date(now.getFullYear(), now.getMonth(), 1);
  state.calMonth = m;
  $("calTitle").textContent = m.toLocaleString(undefined, { month: "long", year: "numeric" });
  const grid = $("calGrid");
  grid.innerHTML = ["Su", "Mo", "Tu", "We", "Th", "Fr", "Sa"]
    .map((d) => `<div class="dow">${d}</div>`).join("");
  const firstDow = m.getDay();
  const daysInMonth = new Date(m.getFullYear(), m.getMonth() + 1, 0).getDate();
  // events + run records by day
  const byDay = {};
  for (const ev of state.calendarEvents) {
    if (!ev.start) continue;
    const d = new Date(ev.start);
    if (d.getFullYear() !== m.getFullYear() || d.getMonth() !== m.getMonth()) continue;
    (byDay[d.getDate()] ||= []).push(ev.meta?.eventName || ev.title || "event");
  }
  for (const r of [...state.runs, ...state.archived]) {
    const [y, mo, da] = (r.runDate || "").split("-").map(Number);
    if (y === m.getFullYear() && mo === m.getMonth() + 1)
      (byDay[da] ||= []).push(`run: ${r.name}`);
  }
  for (let i = 0; i < firstDow; i++)
    grid.insertAdjacentHTML("beforeend", '<div class="day blank"></div>');
  for (let d = 1; d <= daysInMonth; d++) {
    const isToday = d === now.getDate() && m.getMonth() === now.getMonth()
      && m.getFullYear() === now.getFullYear();
    const chips = (byDay[d] || []);
    const shown = chips.slice(0, 3).map((c) =>
      `<span class="cal-chip" title="${esc(c)}">${esc(c)}</span>`).join("");
    const more = chips.length > 3
      ? `<span class="muted">+${chips.length - 3} more</span>` : "";
    grid.insertAdjacentHTML("beforeend",
      `<div class="day${isToday ? " today" : ""}"><span class="num">${d}</span>${shown}${more}</div>`);
  }
}

/* ---------------- admin: user directory ---------------- */

async function loadUsers() {
  try {
    const res = await api("GET", "/api/users");
    state.users = res.users;
    state.roleKeys = res.roles || state.roleKeys;
    if (res.defaultPassword) state.defaultTempPassword = res.defaultPassword;
  } catch { return; }
  if (!state.roleKeys.length) {
    try {
      const d = await api("GET", "/api/domains");
      state.roleKeys = d.roleKeys || [];
    } catch {}
  }
  renderRoleInputs();
  renderUsers();
}

function renderRoleInputs() {
  $("userRoles").innerHTML = state.roleKeys.map((r) =>
    `<label style="display:block;font-size:12px">
       <input type="checkbox" value="${esc(r)}"> ${esc(r)}</label>`).join("");
  $("userRoleFilter").innerHTML = '<option value="">all roles</option>' +
    state.roleKeys.map((r) => `<option>${esc(r)}</option>`).join("");
}

function renderUsers() {
  const q = $("userSearch").value.toLowerCase();
  const rf = $("userRoleFilter").value;
  $("userRows").innerHTML = state.users
    .filter((u) => !q || u.name.toLowerCase().includes(q) || u.email.toLowerCase().includes(q))
    .filter((u) => !rf || (u.roles || []).includes(rf))
    .map((u) => `
      <tr>
        <td>${esc(u.name)}</td><td>${esc(u.email)}</td>
        <td>${(u.roles || []).map((r) => `<span class="pill">${esc(r)}</span>`).join("")}</td>
        <td>${u.needsPasswordReset ? "⚠" : ""}</td>
        <td><button data-act="edit" data-id="${esc(u.id)}">edit</button>
            <button data-act="reset" data-id="${esc(u.id)}">reset pw</button></td>
      </tr>`).join("");
}
$("userSearch").oninput = renderUsers;
$("userRoleFilter").onchange = renderUsers;

$("userRows").onclick = async (e) => {
  const btn = e.target.closest("button"); if (!btn) return;
  const u = state.users.find((x) => x.id === btn.dataset.id);
  if (btn.dataset.act === "edit" && u) {
    $("userFormTitle").textContent = `edit ${u.name}`;
    $("userId").value = u.id;
    $("userName").value = u.name;
    $("userEmail").value = u.email;
    for (const cb of $("userRoles").querySelectorAll("input"))
      cb.checked = (u.roles || []).includes(cb.value);
  } else if (btn.dataset.act === "reset") {
    try {
      const res = await api("POST", `/api/users/${btn.dataset.id}/reset-password`, {});
      toast(`temp password set for ${res.user.name}` +
        (state.defaultTempPassword ? `: ${state.defaultTempPassword}` : ""));
      loadUsers();
    } catch (err) { toast(err.message, true); }
  }
};

$("userFormClear").onclick = () => {
  $("userFormTitle").textContent = "new user";
  $("userId").value = ""; $("userName").value = ""; $("userEmail").value = "";
  for (const cb of $("userRoles").querySelectorAll("input")) cb.checked = false;
};

$("userForm").onsubmit = async (e) => {
  e.preventDefault();
  const roles = [...$("userRoles").querySelectorAll("input:checked")].map((c) => c.value);
  const body = { name: $("userName").value.trim(), email: $("userEmail").value.trim(), roles };
  try {
    if ($("userId").value) await api("PUT", `/api/users/${$("userId").value}`, body);
    else await api("POST", "/api/users", body);
    toast("user saved");
    $("userFormClear").onclick();
    loadUsers();
  } catch (err) { toast(err.message, true); }
};

/* ---------------- config drawer + webhook modal ---------------- */

$("configBtn").onclick = () => {
  const d = $("drawer");
  d.classList.toggle("open");
  if (d.classList.contains("open") && state.config) {
    $("cfgHost").value = state.config.host || "";
    $("cfgPort").value = state.config.port || "";
    $("cfgProvider").value = state.config.storageProvider || "sqlite";
    $("cfgFeed").value = state.config.calendar?.feedUrl || "";
    $("cfgWebhookUrl").value = state.config.webhook?.url || "";
    $("cfgWebhookSecret").value = state.config.webhook?.secret || "";
  }
};
document.addEventListener("keydown", (e) => {
  if (e.key === "Escape") {
    $("drawer").classList.remove("open");
    $("webhookModal").classList.remove("open");
    $("stepEditModal").classList.remove("open");
    $("rowMenu").classList.remove("open");
    $("dayDetail").classList.remove("open");
  }
});

$("configForm").onsubmit = async (e) => {
  e.preventDefault();
  const cfg = {
    ...state.config,
    host: $("cfgHost").value,
    port: parseInt($("cfgPort").value || "0", 10) || state.config.port,
    storageProvider: $("cfgProvider").value,
    calendar: { ...(state.config.calendar || {}), feedUrl: $("cfgFeed").value },
    webhook: {
      ...(state.config.webhook || {}),
      url: $("cfgWebhookUrl").value,
      secret: $("cfgWebhookSecret").value, // '***' keeps existing server-side
    },
  };
  try {
    const res = await api("PUT", "/api/config", cfg);
    state.config = res.config;
    $("configStatus").textContent =
      `saved · storage now ${res.storage} (host/port changes need restart)`;
    toast("config saved");
    loadHealth(); loadRuns(); loadArchive();
  } catch (err) { $("configStatus").textContent = err.message; }
};

$("webhookPreviewBtn").onclick = async () => {
  try {
    const res = await api("GET", "/api/webhook/preview");
    $("webhookHeaders").textContent = JSON.stringify(res.headers, null, 1);
    $("webhookPayload").textContent = JSON.stringify(res.payload, null, 1);
    $("webhookModal").classList.add("open");
  } catch (err) { toast(err.message, true); }
};
$("webhookModalClose").onclick = () => $("webhookModal").classList.remove("open");
$("webhookSimBtn").onclick = async () => {
  try {
    const res = await api("POST", "/api/webhook/simulate", {});
    toast(`simulated ${res.simulated} runs · sent ${res.sent} · failed ${res.failed}`);
  } catch (err) { toast(err.message, true); }
};

/* ---------------- go ---------------- */
setInterval(loadHealth, 15000);
refreshSession();
