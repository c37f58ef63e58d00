// Native MPS parser — C++ core with a C ABI for ctypes.
//
// Role parity with the reference cpp/libmps_parser/ (parse_mps() at
// include/mps_parser/parser.hpp:35, mps_data_model_t at
// include/mps_parser/mps_data_model.hpp:53): fixed and free MPS formats,
// ROWS/COLUMNS/RHS/RANGES/BOUNDS/MARKER(integer), OBJSENSE maximization,
// OBJNAME directives, negative-infinity bounds, and the negative-test
// behaviors exercised by datasets/linear_programming/bad-mps-*.mps.
//
// Semantics are kept in lockstep with the Python fallback implementation
// (cuopt_tpu/io/mps_parser.py) — the pytest suite parametrizes over both
// backends and asserts identical results.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <memory>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace tpu_mps {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct ParseError {
  std::string msg;
};

static std::string upper(const std::string& s) {
  std::string r = s;
  for (auto& c : r) c = static_cast<char>(std::toupper(c));
  return r;
}

static std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

static bool is_number_tok(const std::string& tok) {
  std::string t = strip(tok);
  std::string low;
  for (char c : t) low += static_cast<char>(std::tolower(c));
  if (low == "inf" || low == "+inf" || low == "infinity" ||
      low == "+infinity" || low == "-inf" || low == "-infinity")
    return true;
  // ^[+-]?(\d+\.?\d*|\.\d+)([eEdD][+-]?\d+)?$
  size_t i = 0;
  if (i < t.size() && (t[i] == '+' || t[i] == '-')) i++;
  size_t digits = 0;
  while (i < t.size() && std::isdigit((unsigned char)t[i])) { i++; digits++; }
  if (digits > 0) {
    if (i < t.size() && t[i] == '.') {
      i++;
      while (i < t.size() && std::isdigit((unsigned char)t[i])) i++;
    }
  } else {
    if (i >= t.size() || t[i] != '.') return false;
    i++;
    size_t frac = 0;
    while (i < t.size() && std::isdigit((unsigned char)t[i])) { i++; frac++; }
    if (frac == 0) return false;
  }
  if (i < t.size() && (t[i] == 'e' || t[i] == 'E' || t[i] == 'd' ||
                       t[i] == 'D')) {
    i++;
    if (i < t.size() && (t[i] == '+' || t[i] == '-')) i++;
    size_t ed = 0;
    while (i < t.size() && std::isdigit((unsigned char)t[i])) { i++; ed++; }
    if (ed == 0) return false;
  }
  return i == t.size();
}

static double to_float(const std::string& tok, const std::string& line) {
  std::string t = strip(tok);
  std::string low;
  for (char c : t) low += static_cast<char>(std::tolower(c));
  if (low == "inf" || low == "+inf" || low == "infinity" ||
      low == "+infinity" || low == "1e30" || low == "1e+30")
    return kInf;
  if (low == "-inf" || low == "-infinity" || low == "-1e30" ||
      low == "-1e+30")
    return -kInf;
  if (!is_number_tok(t))
    throw ParseError{"Bad numeric value '" + tok + "' in line: " + line};
  for (auto& c : t)
    if (c == 'd' || c == 'D') c = 'e';
  return std::strtod(t.c_str(), nullptr);
}

enum Section {
  kNone, kName, kObjsense, kObjname, kRows, kColumns, kRhs, kRanges,
  kBounds, kEndata, kDone,
};

struct Parser {
  bool fixed = false;
  std::string problem_name;
  std::string objective_name;  // empty = unset
  bool have_objective_name = false;
  bool objname_preseeded = false;
  std::string objname_directive;
  bool have_objname_directive = false;
  bool maximize = false;
  std::vector<char> row_types;
  std::vector<std::string> row_names;
  std::unordered_map<std::string, int64_t> row_map;
  std::unordered_set<std::string> free_rows;
  std::vector<std::string> var_names;
  std::unordered_map<std::string, int64_t> var_map;
  std::vector<char> var_types;  // 'C' / 'I'
  std::vector<std::vector<int64_t>> col_rows;
  std::vector<std::vector<double>> col_vals;
  std::unordered_map<int64_t, double> obj_coeffs;
  std::unordered_map<int64_t, double> rhs_values;
  std::unordered_map<int64_t, double> range_values;
  double objective_offset = 0.0;
  std::unordered_map<int64_t, double> lb, ub;
  std::unordered_set<int64_t> bounds_defined;
  bool saw_columns = false;
  bool saw_rows = false;
  bool in_integer_block = false;
  std::unordered_set<std::string> closed_vars;
  std::string current_var;
  bool have_current_var = false;

  // ------------------------------------------------------------- tokenizer
  // Returns false when the line is a no-op after comment stripping.
  bool data_tokens(const std::string& raw, Section section,
                   std::vector<std::string>* out) {
    out->clear();
    if (fixed) {
      auto field = [&](size_t a, size_t b) -> std::string {
        if (a >= raw.size()) return "";
        return strip(raw.substr(a, std::min(b, raw.size()) - a));
      };
      std::string f[6] = {field(1, 3),  field(4, 12),  field(14, 22),
                          field(24, 36), field(39, 47), field(49, 61)};
      for (int k = 0; k < 6; k++) {
        if (!f[k].empty() && f[k][0] == '$') {
          for (int j = k; j < 6; j++) f[j] = "";
          break;
        }
      }
      std::vector<std::string> toks;
      if (section == kRows) {
        toks = {f[0], f[1]};
      } else if (section == kBounds) {
        toks = {f[0], f[1], f[2]};
        if (!f[3].empty()) toks.push_back(f[3]);
      } else if (section == kColumns || section == kRhs ||
                 section == kRanges) {
        toks = {f[1], f[2]};
        if (!f[3].empty()) toks.push_back(f[3]);
        if (!f[4].empty()) {
          toks.push_back(f[4]);
          if (!f[5].empty()) toks.push_back(f[5]);
        }
        size_t nonempty = 0;
        for (auto& t : toks)
          if (!t.empty()) nonempty++;
        if (nonempty == 1) return false;  // only a name after comment strip
      } else {
        for (auto& t : f)
          if (!t.empty()) toks.push_back(t);
      }
      for (auto& t : toks)
        if (!t.empty()) out->push_back(t);
      return !out->empty();
    }
    // free format: whitespace split, $ comments
    std::vector<std::string> toks;
    {
      std::string cur;
      for (char c : raw) {
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
          if (!cur.empty()) { toks.push_back(cur); cur.clear(); }
        } else {
          cur += c;
        }
      }
      if (!cur.empty()) toks.push_back(cur);
    }
    bool truncated = false;
    for (size_t k = 0; k < toks.size(); k++) {
      if (!toks[k].empty() && toks[k][0] == '$') {
        toks.resize(k);
        truncated = true;
        break;
      }
    }
    if (toks.empty()) return false;
    if (truncated &&
        (section == kColumns || section == kRhs || section == kRanges) &&
        toks.size() == 1)
      return false;
    *out = std::move(toks);
    return true;
  }

  void set_objsense(const std::string& tok) {
    std::string t = upper(tok);
    if (t == "MAX" || t == "MAXIMIZE") maximize = true;
    else if (t == "MIN" || t == "MINIMIZE") maximize = false;
    else throw ParseError{"Bad OBJSENSE value '" + tok + "'"};
  }

  // ----------------------------------------------------------------- rows
  void parse_row(const std::vector<std::string>& toks,
                 const std::string& raw) {
    saw_rows = true;
    if (toks.size() < 2)
      throw ParseError{"ROWS entry needs type and name: " + raw};
    std::string rtype = upper(toks[0]);
    const std::string& name = toks[1];
    if (rtype == "N") {
      if (objname_preseeded) {
        free_rows.insert(name);
        return;
      }
      if (!have_objective_name) {
        objective_name = name;
        have_objective_name = true;
        free_rows.insert(name);
      } else {
        free_rows.insert(name);
      }
      return;
    }
    if (rtype != "L" && rtype != "G" && rtype != "E")
      throw ParseError{"Bad row type '" + rtype + "' in line " + raw};
    if (row_map.count(name) || free_rows.count(name))
      throw ParseError{"Duplicate row '" + name + "'"};
    row_map[name] = static_cast<int64_t>(row_names.size());
    row_names.push_back(name);
    row_types.push_back(rtype[0]);
  }

  // -------------------------------------------------------------- columns
  int64_t intern_var(const std::string& var) {
    auto it = var_map.find(var);
    if (it != var_map.end()) return it->second;
    int64_t j = static_cast<int64_t>(var_names.size());
    var_map[var] = j;
    var_names.push_back(var);
    var_types.push_back(in_integer_block ? 'I' : 'C');
    col_rows.emplace_back();
    col_vals.emplace_back();
    return j;
  }

  void parse_column(const std::vector<std::string>& toks,
                    const std::string& raw) {
    // MARKER handling (both token positions, as in the Python fallback)
    bool has_marker = false;
    for (auto& t : toks)
      if (upper(t) == "'MARKER'") has_marker = true;
    if (has_marker) {
      std::string joined;
      for (auto& t : toks) joined += upper(t) + " ";
      if (joined.find("INTORG") != std::string::npos) {
        in_integer_block = true;
        return;
      }
      if (joined.find("INTEND") != std::string::npos) {
        in_integer_block = false;
        return;
      }
      return;
    }
    if (toks.size() < 3 || toks.size() % 2 == 0)
      throw ParseError{"Bad COLUMNS entry: " + raw};
    const std::string& var = toks[0];
    if (!have_current_var || var != current_var) {
      if (closed_vars.count(var))
        throw ParseError{"COLUMNS entries for '" + var +
                         "' are not contiguous"};
      if (have_current_var) closed_vars.insert(current_var);
      current_var = var;
      have_current_var = true;
      intern_var(var);
    }
    int64_t j = var_map[var];
    for (size_t k = 1; k + 1 < toks.size(); k += 2) {
      const std::string& rname = toks[k];
      double val = to_float(toks[k + 1], raw);
      if (have_objective_name && rname == objective_name) {
        obj_coeffs[j] += val;
      } else if (row_map.count(rname)) {
        col_rows[j].push_back(row_map[rname]);
        col_vals[j].push_back(val);
      } else if (free_rows.count(rname)) {
        continue;  // non-objective free row: coefficient dropped
      } else {
        throw ParseError{"Unknown row '" + rname + "' in COLUMNS line " +
                         raw};
      }
    }
  }

  // ------------------------------------------------------------------ rhs
  // Yield (name, value) pairs, handling the optional leading set name.
  template <typename Known, typename Fn>
  void iter_pairs(const std::vector<std::string>& toks,
                  const std::string& raw, const Known& known, Fn&& fn) {
    size_t start = 1;
    if (known(toks[0]) && toks.size() >= 2 && is_number_tok(toks[1]) &&
        toks.size() % 2 == 0)
      start = 0;
    size_t n = toks.size() - start;
    if (n == 0 || n % 2 != 0)
      throw ParseError{"Bad entry pairs in line: " + raw};
    for (size_t k = start; k + 1 < toks.size(); k += 2)
      fn(toks[k], toks[k + 1]);
  }

  void parse_rhs(const std::vector<std::string>& toks,
                 const std::string& raw) {
    auto known = [&](const std::string& name) {
      return row_map.count(name) > 0 ||
             (have_objective_name && name == objective_name);
    };
    iter_pairs(toks, raw, known,
               [&](const std::string& rname, const std::string& vtok) {
      double val = to_float(vtok, raw);
      if (have_objective_name && rname == objective_name) {
        objective_offset = -val;  // reference mps_parser.cpp:795
      } else if (row_map.count(rname)) {
        rhs_values[row_map[rname]] = val;
      } else if (free_rows.count(rname)) {
        // dropped
      } else {
        throw ParseError{"Unknown row '" + rname + "' in RHS: " + raw};
      }
    });
  }

  void parse_range(const std::vector<std::string>& toks,
                   const std::string& raw) {
    auto known = [&](const std::string& name) {
      return row_map.count(name) > 0;
    };
    iter_pairs(toks, raw, known,
               [&](const std::string& rname, const std::string& vtok) {
      double val = to_float(vtok, raw);
      auto it = row_map.find(rname);
      if (it == row_map.end())
        throw ParseError{"Unknown row '" + rname + "' in RANGES: " + raw};
      range_values[it->second] = val;
    });
  }

  // --------------------------------------------------------------- bounds
  void parse_bound(const std::vector<std::string>& toks,
                   const std::string& raw) {
    std::string btype = upper(toks[0]);
    if (btype == "SC")
      throw ParseError{"Unsupported semi-continuous bound type: " + raw};
    bool no_value = (btype == "FR" || btype == "MI" || btype == "PL" ||
                     btype == "BV");
    bool with_value = (btype == "LO" || btype == "UP" || btype == "FX" ||
                       btype == "LI" || btype == "UI");
    if (!no_value && !with_value)
      throw ParseError{"Invalid bound type '" + btype + "': " + raw};
    std::vector<std::string> rest(toks.begin() + 1, toks.end());
    if (rest.empty())
      throw ParseError{"BOUNDS entry missing variable: " + raw};
    // optional bound-set name before the variable name
    if (!var_map.count(rest[0]) && rest.size() >= 2 &&
        (var_map.count(rest[1]) || !is_number_tok(rest[1])))
      rest.erase(rest.begin());
    const std::string& var = rest[0];
    // variables may first appear in BOUNDS (reference accepts this)
    int64_t j = intern_var(var);
    double val = 0.0;
    if (with_value) {
      if (rest.size() < 2)
        throw ParseError{"BOUNDS entry missing value: " + raw};
      val = to_float(rest[1], raw);
    }
    bool had_prior = bounds_defined.count(j) > 0;
    if (btype == "LO") {
      lb[j] = val;
    } else if (btype == "UP") {
      ub[j] = val;
      if (!had_prior && val < 0) lb[j] = -kInf;
    } else if (btype == "FX") {
      lb[j] = val;
      ub[j] = val;
    } else if (btype == "FR") {
      lb[j] = -kInf;
      ub[j] = kInf;
    } else if (btype == "MI") {
      lb[j] = -kInf;
    } else if (btype == "PL") {
      ub[j] = kInf;
    } else if (btype == "BV") {
      lb[j] = 0.0;
      ub[j] = 1.0;
      var_types[j] = 'I';
    } else if (btype == "LI") {
      if (!had_prior) ub[j] = kInf;
      lb[j] = val;
      var_types[j] = 'I';
    } else if (btype == "UI") {
      ub[j] = val;
      if (!had_prior && val < 0) lb[j] = -kInf;
      var_types[j] = 'I';
    }
    bounds_defined.insert(j);
  }

  // ---------------------------------------------------------------- parse
  void parse(const std::string& text) {
    Section section = kNone;
    size_t pos = 0;
    while (pos <= text.size()) {
      size_t end = text.find('\n', pos);
      if (end == std::string::npos) end = text.size();
      std::string raw = text.substr(pos, end - pos);
      pos = end + 1;
      if (!raw.empty() && raw.back() == '\r') raw.pop_back();
      if (strip(raw).empty()) {
        if (end == text.size()) break;
        continue;
      }
      if (raw[0] == '*' || raw[0] == '$') {
        if (end == text.size()) break;
        continue;
      }
      if (raw[0] != ' ' && raw[0] != '\t') {
        // section header line
        std::vector<std::string> toks;
        {
          std::string cur;
          for (char c : raw) {
            if (c == ' ' || c == '\t') {
              if (!cur.empty()) { toks.push_back(cur); cur.clear(); }
            } else cur += c;
          }
          if (!cur.empty()) toks.push_back(cur);
        }
        std::string sec = upper(toks[0]);
        if (sec == "NAME") {
          section = kName;
          problem_name = toks.size() > 1 ? toks[1] : "";
        } else if (sec == "OBJSENSE" || sec == "OBJSENS") {
          if (toks.size() > 1) {
            set_objsense(toks[1]);
            section = kDone;
          } else {
            section = kObjsense;
          }
        } else if (sec == "OBJNAME") {
          if (toks.size() > 1) {
            objname_directive = toks[1];
            have_objname_directive = true;
            section = kDone;
          } else {
            section = kObjname;
          }
        } else if (sec == "ROWS") {
          section = kRows;
        } else if (sec == "COLUMNS") {
          section = kColumns;
          saw_columns = true;
        } else if (sec == "RHS") {
          section = kRhs;
        } else if (sec == "RANGES") {
          section = kRanges;
        } else if (sec == "BOUNDS") {
          section = kBounds;
        } else if (sec == "ENDATA") {
          break;
        } else {
          throw ParseError{"Unknown section '" + toks[0] + "'"};
        }
        if (end == text.size()) break;
        continue;
      }
      // data line
      if (section == kNone)
        throw ParseError{"Data line before any section: " + raw};
      if (section == kColumns) {
        std::string up = upper(raw);
        if (up.find("MARKER") != std::string::npos) {
          if (up.find("INTORG") != std::string::npos) {
            in_integer_block = true;
            saw_columns = true;
            if (end == text.size()) break;
            continue;
          }
          if (up.find("INTEND") != std::string::npos) {
            in_integer_block = false;
            if (end == text.size()) break;
            continue;
          }
        }
      }
      std::vector<std::string> toks;
      if (!data_tokens(raw, section, &toks)) {
        if (end == text.size()) break;
        continue;
      }
      switch (section) {
        case kName:
        case kDone:
          throw ParseError{"Unexpected data line: " + raw};
        case kObjsense:
          set_objsense(toks[0]);
          section = kDone;
          break;
        case kObjname:
          objname_directive = toks[0];
          have_objname_directive = true;
          section = kDone;
          break;
        case kRows:
          parse_row(toks, raw);
          break;
        case kColumns:
          saw_columns = true;
          parse_column(toks, raw);
          break;
        case kRhs:
          parse_rhs(toks, raw);
          break;
        case kRanges:
          parse_range(toks, raw);
          break;
        case kBounds:
          parse_bound(toks, raw);
          break;
        default:
          break;
      }
      if (end == text.size()) break;
    }
  }

  void check_finalize_errors() {
    if (!have_objective_name)
      throw ParseError{"No objective (N) row found"};
    if (!saw_rows) throw ParseError{"Missing ROWS section"};
    if (!saw_columns) throw ParseError{"Missing COLUMNS section"};
    if (have_objname_directive && !objname_preseeded) {
      if (!free_rows.count(objname_directive))
        throw ParseError{"OBJNAME row '" + objname_directive +
                         "' not found"};
    }
    if (objname_preseeded && !free_rows.count(objective_name))
      throw ParseError{"OBJNAME row '" + objective_name + "' not found"};
  }
};

// Result of a finalized parse, flattened for the C ABI.
struct Model {
  int64_t n_rows = 0, n_cols = 0, nnz = 0;
  std::vector<int64_t> offsets, indices;
  std::vector<double> values;
  std::vector<double> c;
  double objective_offset = 0.0;
  int maximize = 0;
  std::vector<double> lc, uc, lv, uv, rhs;
  std::vector<char> row_types, var_types;
  std::string problem_name, objective_name;
  std::vector<std::string> var_names, row_names;
  std::string error;  // non-empty on failure
};

static void finalize(Parser& p, Model* m) {
  p.check_finalize_errors();
  int64_t n = static_cast<int64_t>(p.row_names.size());
  int64_t ncols = static_cast<int64_t>(p.var_names.size());
  m->n_rows = n;
  m->n_cols = ncols;
  m->lc.assign(n, 0.0);
  m->uc.assign(n, 0.0);
  m->rhs.assign(n, 0.0);
  m->row_types.assign(p.row_types.begin(), p.row_types.end());
  for (int64_t i = 0; i < n; i++) {
    double b = 0.0;
    auto it = p.rhs_values.find(i);
    if (it != p.rhs_values.end()) b = it->second;
    m->rhs[i] = b;
    char t = p.row_types[i];
    if (t == 'E') {
      m->lc[i] = m->uc[i] = b;
    } else if (t == 'G') {
      m->lc[i] = b;
      m->uc[i] = kInf;
    } else {
      m->lc[i] = -kInf;
      m->uc[i] = b;
    }
  }
  for (auto& kv : p.range_values) {
    int64_t i = kv.first;
    double v = kv.second;
    char t = p.row_types[i];
    double b = m->rhs[i];
    if (t == 'E') {
      if (v >= 0) m->uc[i] = b + v;
      else m->lc[i] = b + v;
    } else if (t == 'G') {
      m->uc[i] = m->lc[i] + std::fabs(v);
    } else {
      m->lc[i] = m->uc[i] - std::fabs(v);
    }
  }
  // CSC -> CSR (stable by row, preserving column order within a row)
  int64_t nnz = 0;
  for (auto& col : p.col_rows) nnz += static_cast<int64_t>(col.size());
  m->nnz = nnz;
  std::vector<int64_t> row_count(n + 1, 0);
  for (auto& col : p.col_rows)
    for (int64_t r : col) row_count[r + 1]++;
  m->offsets.assign(n + 1, 0);
  for (int64_t i = 0; i < n; i++)
    m->offsets[i + 1] = m->offsets[i] + row_count[i + 1];
  std::vector<int64_t> fill(m->offsets.begin(), m->offsets.end() - 1);
  m->indices.assign(nnz, 0);
  m->values.assign(nnz, 0.0);
  for (int64_t j = 0; j < ncols; j++) {
    for (size_t k = 0; k < p.col_rows[j].size(); k++) {
      int64_t r = p.col_rows[j][k];
      int64_t dst = fill[r]++;
      m->indices[dst] = j;
      m->values[dst] = p.col_vals[j][k];
    }
  }
  m->c.assign(ncols, 0.0);
  for (auto& kv : p.obj_coeffs) m->c[kv.first] = kv.second;
  m->lv.assign(ncols, 0.0);
  m->uv.assign(ncols, kInf);
  for (auto& kv : p.lb) m->lv[kv.first] = kv.second;
  for (auto& kv : p.ub) m->uv[kv.first] = kv.second;
  m->objective_offset = p.objective_offset;
  m->maximize = p.maximize ? 1 : 0;
  m->var_types.assign(p.var_types.begin(), p.var_types.end());
  m->problem_name = p.problem_name;
  m->objective_name = p.objective_name;
  m->var_names = p.var_names;
  m->row_names = p.row_names;
}

// Pre-scan for an OBJNAME directive (value on same or following line),
// mirroring cuopt_tpu/io/mps_parser.py _parse_text's probe.
static bool scan_objname(const std::string& text, std::string* out) {
  std::vector<std::string> lines;
  size_t pos = 0;
  while (pos <= text.size()) {
    size_t end = text.find('\n', pos);
    if (end == std::string::npos) end = text.size();
    lines.push_back(text.substr(pos, end - pos));
    if (end == text.size()) break;
    pos = end + 1;
  }
  for (size_t idx = 0; idx < lines.size(); idx++) {
    std::string raw = lines[idx];
    if (!raw.empty() && raw.back() == '\r') raw.pop_back();
    if (raw.empty() || raw[0] == ' ' || raw[0] == '\t' || raw[0] == '*' ||
        raw[0] == '$')
      continue;
    std::vector<std::string> toks;
    std::string cur;
    for (char c : raw) {
      if (c == ' ' || c == '\t') {
        if (!cur.empty()) { toks.push_back(cur); cur.clear(); }
      } else cur += c;
    }
    if (!cur.empty()) toks.push_back(cur);
    if (toks.empty() || upper(toks[0]) != "OBJNAME") continue;
    if (toks.size() > 1) {
      *out = toks[1];
      return true;
    }
    for (size_t k = idx + 1; k < lines.size(); k++) {
      std::string nxt = lines[k];
      if (!nxt.empty() && nxt.back() == '\r') nxt.pop_back();
      if (strip(nxt).empty() || nxt[0] == '*' || nxt[0] == '$') continue;
      std::string first;
      for (char c : nxt) {
        if (c == ' ' || c == '\t') {
          if (!first.empty()) break;
        } else first += c;
      }
      if (!first.empty()) {
        *out = first;
        return true;
      }
      break;
    }
    return false;
  }
  return false;
}

static void parse_text(const std::string& text, bool fixed, Model* m) {
  Parser parser;
  parser.fixed = fixed;
  std::string objname;
  if (scan_objname(text, &objname)) {
    parser.objective_name = objname;
    parser.have_objective_name = true;
    parser.objname_preseeded = true;
    parser.objname_directive = objname;
    parser.have_objname_directive = true;
  }
  parser.parse(text);
  finalize(parser, m);
}

}  // namespace tpu_mps

// ----------------------------------------------------------------- C ABI
extern "C" {

using tpu_mps::Model;

// Parse from an in-memory buffer. fixed_format: 0 = free w/ fixed
// fallback (matches the Python front end), 1 = fixed only.
// Returns an owned handle; check mps_error() for failure.
void* mps_parse_string(const char* text_c, int fixed_format) {
  auto* m = new Model();
  std::string text(text_c ? text_c : "");
  if (tpu_mps::strip(text).empty()) {
    m->error = "Empty MPS file";
    return m;
  }
  try {
    if (fixed_format) {
      tpu_mps::parse_text(text, true, m);
    } else {
      try {
        tpu_mps::parse_text(text, false, m);
      } catch (const tpu_mps::ParseError& e) {
        Model retry;
        try {
          tpu_mps::parse_text(text, true, &retry);
          *m = std::move(retry);
        } catch (const tpu_mps::ParseError&) {
          m->error = e.msg;  // report the free-format error
        }
      }
    }
  } catch (const tpu_mps::ParseError& e) {
    m->error = e.msg;
  } catch (const std::exception& e) {
    m->error = std::string("internal error: ") + e.what();
  }
  return m;
}

void* mps_parse(const char* path, int fixed_format) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    auto* m = new Model();
    m->error = std::string("Cannot open MPS file: ") + path;
    return m;
  }
  std::string text;
  char buf[1 << 16];
  size_t got;
  while ((got = std::fread(buf, 1, sizeof(buf), f)) > 0)
    text.append(buf, got);
  std::fclose(f);
  return mps_parse_string(text.c_str(), fixed_format);
}

const char* mps_error(void* h) {
  auto* m = static_cast<Model*>(h);
  return m->error.empty() ? nullptr : m->error.c_str();
}

int64_t mps_num_rows(void* h) { return static_cast<Model*>(h)->n_rows; }
int64_t mps_num_cols(void* h) { return static_cast<Model*>(h)->n_cols; }
int64_t mps_num_nnz(void* h) { return static_cast<Model*>(h)->nnz; }
int mps_maximize(void* h) { return static_cast<Model*>(h)->maximize; }
double mps_objective_offset(void* h) {
  return static_cast<Model*>(h)->objective_offset;
}

void mps_get_csr(void* h, int64_t* offsets, int64_t* indices,
                 double* values) {
  auto* m = static_cast<Model*>(h);
  std::memcpy(offsets, m->offsets.data(),
              sizeof(int64_t) * m->offsets.size());
  if (m->nnz) {
    std::memcpy(indices, m->indices.data(), sizeof(int64_t) * m->nnz);
    std::memcpy(values, m->values.data(), sizeof(double) * m->nnz);
  }
}

void mps_get_objective(void* h, double* c) {
  auto* m = static_cast<Model*>(h);
  if (m->n_cols) std::memcpy(c, m->c.data(), sizeof(double) * m->n_cols);
}

void mps_get_constraint_bounds(void* h, double* lc, double* uc,
                               double* rhs) {
  auto* m = static_cast<Model*>(h);
  if (m->n_rows) {
    std::memcpy(lc, m->lc.data(), sizeof(double) * m->n_rows);
    std::memcpy(uc, m->uc.data(), sizeof(double) * m->n_rows);
    std::memcpy(rhs, m->rhs.data(), sizeof(double) * m->n_rows);
  }
}

void mps_get_variable_bounds(void* h, double* lv, double* uv) {
  auto* m = static_cast<Model*>(h);
  if (m->n_cols) {
    std::memcpy(lv, m->lv.data(), sizeof(double) * m->n_cols);
    std::memcpy(uv, m->uv.data(), sizeof(double) * m->n_cols);
  }
}

void mps_get_types(void* h, char* row_types, char* var_types) {
  auto* m = static_cast<Model*>(h);
  if (m->n_rows)
    std::memcpy(row_types, m->row_types.data(), m->n_rows);
  if (m->n_cols)
    std::memcpy(var_types, m->var_types.data(), m->n_cols);
}

const char* mps_problem_name(void* h) {
  return static_cast<Model*>(h)->problem_name.c_str();
}
const char* mps_objective_name(void* h) {
  return static_cast<Model*>(h)->objective_name.c_str();
}
const char* mps_var_name(void* h, int64_t j) {
  auto* m = static_cast<Model*>(h);
  if (j < 0 || j >= m->n_cols) return "";
  return m->var_names[j].c_str();
}
const char* mps_row_name(void* h, int64_t i) {
  auto* m = static_cast<Model*>(h);
  if (i < 0 || i >= m->n_rows) return "";
  return m->row_names[i].c_str();
}

void mps_free(void* h) { delete static_cast<Model*>(h); }

}  // extern "C"
