// Native table-file parser (ref: the reference's C++ load path —
// utils/load_table.cpp and import_export/csv/csv_parser.cpp).
//
// Parses pipe- or comma-separated files into columnar buffers with
// in-parser sorted-dictionary encoding for string columns and civil-date
// parsing for DATE columns.  Exposed through a C ABI consumed via ctypes
// (no pybind11 in this environment).
//
// Column type chars: 'i' int64, 'f' double, 's' string->dict codes,
//                    'd' date 'YYYY-MM-DD' -> int32 days since epoch.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Column {
  char type;
  std::vector<int64_t> ints;       // 'i'
  std::vector<double> doubles;     // 'f'
  std::vector<int32_t> days;       // 'd'
  std::vector<int32_t> codes;      // 's' (temporary: insertion-order ids)
  std::vector<std::string> dict;   // insertion-order strings
  std::unordered_map<std::string, int32_t> lookup;
  std::vector<int32_t> remap;      // insertion-order id -> sorted code
  std::vector<uint8_t> valid;      // per-row non-NULL flags (CSV only)
  bool has_nulls = false;
};

struct ParsedTable {
  std::vector<Column> columns;
  int64_t num_rows = 0;
};

int64_t days_from_civil(int64_t y, int64_t m, int64_t d) {
  y -= m <= 2;
  const int64_t era = (y >= 0 ? y : y - 399) / 400;
  const int64_t yoe = y - era * 400;
  const int64_t mp = m > 2 ? m - 3 : m + 9;
  const int64_t doy = (153 * mp + 2) / 5 + d - 1;
  const int64_t doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097 + doe - 719468;
}

inline void parse_field(Column& col, const char* begin, const char* end) {
  switch (col.type) {
    case 'i': {
      col.ints.push_back(strtoll(begin, nullptr, 10));
      break;
    }
    case 'f': {
      col.doubles.push_back(strtod(begin, nullptr));
      break;
    }
    case 'd': {
      // YYYY-MM-DD
      long y = strtol(begin, nullptr, 10);
      long m = (end - begin >= 7) ? strtol(begin + 5, nullptr, 10) : 1;
      long d = (end - begin >= 10) ? strtol(begin + 8, nullptr, 10) : 1;
      col.days.push_back((int32_t)days_from_civil(y, m, d));
      break;
    }
    case 's': {
      std::string s(begin, end - begin);
      auto it = col.lookup.find(s);
      int32_t id;
      if (it == col.lookup.end()) {
        id = (int32_t)col.dict.size();
        col.lookup.emplace(std::move(s), id);
        col.dict.push_back(std::string(begin, end - begin));
      } else {
        id = it->second;
      }
      col.codes.push_back(id);
      break;
    }
  }
}

inline void parse_field_nullable(Column& col, const char* begin,
                                 const char* end, bool quoted) {
  // unquoted empty field = NULL (ref: import_export/csv/csv_parser.cpp —
  // only quoted empties are empty strings)
  bool is_null = !quoted && begin == end;
  col.valid.push_back(is_null ? 0 : 1);
  if (is_null) {
    col.has_nulls = true;
    // placeholder payloads keep the columns rectangular
    switch (col.type) {
      case 'i': col.ints.push_back(0); break;
      case 'f': col.doubles.push_back(0.0); break;
      case 'd': col.days.push_back(0); break;
      case 's': {
        auto it = col.lookup.find("");
        int32_t id;
        if (it == col.lookup.end()) {
          id = (int32_t)col.dict.size();
          col.lookup.emplace("", id);
          col.dict.push_back("");
        } else {
          id = it->second;
        }
        col.codes.push_back(id);
        break;
      }
    }
    return;
  }
  parse_field(col, begin, end);
}

void sort_dictionaries(ParsedTable* table) {
  for (auto& col : table->columns) {
    if (col.type != 's') continue;
    std::vector<int32_t> order(col.dict.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = (int32_t)i;
    std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
      return col.dict[a] < col.dict[b];
    });
    col.remap.resize(order.size());
    std::vector<std::string> sorted_dict(order.size());
    for (size_t rank = 0; rank < order.size(); ++rank) {
      col.remap[order[rank]] = (int32_t)rank;
      sorted_dict[rank] = col.dict[order[rank]];
    }
    col.dict = std::move(sorted_dict);
  }
}

char* read_whole_file(const char* path, long* out_size) {
  FILE* fh = fopen(path, "rb");
  if (!fh) return nullptr;
  fseek(fh, 0, SEEK_END);
  long size = ftell(fh);
  fseek(fh, 0, SEEK_SET);
  char* buf = (char*)malloc(size + 1);
  if (fread(buf, 1, size, fh) != (size_t)size) {
    fclose(fh);
    free(buf);
    return nullptr;
  }
  buf[size] = '\0';
  fclose(fh);
  *out_size = size;
  return buf;
}

}  // namespace

extern "C" {

// RFC-4180 CSV parser (ref: import_export/csv/csv_parser.hpp:26): quoted
// fields with "" escapes and embedded separators/newlines, optional
// header row, unquoted-empty = NULL.  Same handle/accessor ABI as
// tbl_parse plus per-column validity.
void* csv_parse(const char* path, const char* types, int n_cols, char sep,
                int skip_header) {
  long size = 0;
  char* buf = read_whole_file(path, &size);
  if (!buf) return nullptr;
  auto* table = new ParsedTable();
  table->columns.resize(n_cols);
  for (int i = 0; i < n_cols; ++i) table->columns[i].type = types[i];

  const char* p = buf;
  const char* file_end = buf + size;
  std::string scratch;  // unescaped quoted-field payload
  int col = 0;
  bool row_open = false;  // row has at least one parsed byte/field
  if (skip_header) {
    // header may itself contain quoted fields with newlines
    bool in_q = false;
    while (p < file_end) {
      char c = *p++;
      if (in_q) {
        if (c == '"') {
          if (p < file_end && *p == '"') ++p; else in_q = false;
        }
      } else if (c == '"') {
        in_q = true;
      } else if (c == '\n') {
        break;
      }
    }
  }
  auto end_field = [&](const char* b, const char* e, bool quoted) {
    if (col < n_cols)
      parse_field_nullable(table->columns[col], b, e, quoted);
    ++col;
  };
  auto end_row = [&]() {
    if (!row_open && col == 0) return;  // empty line
    while (col < n_cols)  // ragged rows: trailing NULLs
      parse_field_nullable(table->columns[col++], nullptr, nullptr, false);
    table->num_rows++;
    col = 0;
    row_open = false;
  };
  while (p < file_end) {
    if (*p == '"') {  // quoted field
      row_open = true;
      ++p;
      scratch.clear();
      while (p < file_end) {
        if (*p == '"') {
          if (p + 1 < file_end && p[1] == '"') {
            scratch.push_back('"');
            p += 2;
          } else {
            ++p;
            break;
          }
        } else {
          scratch.push_back(*p++);
        }
      }
      end_field(scratch.data(), scratch.data() + scratch.size(), true);
      // consume the delimiter / newline after the closing quote
      if (p < file_end && *p == sep) {
        ++p;
      } else if (p < file_end && (*p == '\n' || *p == '\r')) {
        if (*p == '\r' && p + 1 < file_end && p[1] == '\n') ++p;
        ++p;
        end_row();
      }
    } else {  // unquoted field
      const char* b = p;
      while (p < file_end && *p != sep && *p != '\n' && *p != '\r') ++p;
      const char* e = p;
      bool at_line_end = p >= file_end || *p == '\n' || *p == '\r';
      if (!(at_line_end && b == e && col == 0)) {
        row_open = true;
        end_field(b, e, false);
      }
      if (p < file_end) {
        if (*p == sep) {
          ++p;
        } else {
          if (*p == '\r' && p + 1 < file_end && p[1] == '\n') ++p;
          ++p;
          end_row();
        }
      }
    }
  }
  end_row();  // final row without trailing newline
  free(buf);
  sort_dictionaries(table);
  return table;
}

int tbl_col_has_nulls(void* h, int col) {
  return ((ParsedTable*)h)->columns[col].has_nulls ? 1 : 0;
}

void tbl_fill_valid(void* h, int col, uint8_t* out) {
  auto& c = ((ParsedTable*)h)->columns[col];
  memcpy(out, c.valid.data(), c.valid.size());
}

void* tbl_parse(const char* path, const char* types, int n_cols, char sep) {
  // read whole file (simpler + fast; files are benchmark-scale)
  long size = 0;
  char* buf = read_whole_file(path, &size);
  if (!buf) return nullptr;
  auto* table = new ParsedTable();
  table->columns.resize(n_cols);
  for (int i = 0; i < n_cols; ++i) table->columns[i].type = types[i];

  const char* p = buf;
  const char* file_end = buf + size;
  while (p < file_end) {
    const char* line_end = (const char*)memchr(p, '\n', file_end - p);
    if (!line_end) line_end = file_end;
    if (line_end > p) {  // skip empty lines
      const char* f = p;
      for (int c = 0; c < n_cols; ++c) {
        const char* f_end = (const char*)memchr(f, sep, line_end - f);
        if (!f_end || f_end > line_end) f_end = line_end;
        parse_field(table->columns[c], f, f_end);
        f = f_end < line_end ? f_end + 1 : line_end;
      }
      table->num_rows++;
    }
    p = line_end + 1;
  }
  free(buf);
  sort_dictionaries(table);
  return table;
}

long tbl_num_rows(void* h) { return ((ParsedTable*)h)->num_rows; }

void tbl_fill_int64(void* h, int col, int64_t* out) {
  auto& c = ((ParsedTable*)h)->columns[col];
  memcpy(out, c.ints.data(), c.ints.size() * sizeof(int64_t));
}

void tbl_fill_double(void* h, int col, double* out) {
  auto& c = ((ParsedTable*)h)->columns[col];
  memcpy(out, c.doubles.data(), c.doubles.size() * sizeof(double));
}

void tbl_fill_days(void* h, int col, int32_t* out) {
  auto& c = ((ParsedTable*)h)->columns[col];
  memcpy(out, c.days.data(), c.days.size() * sizeof(int32_t));
}

void tbl_fill_codes(void* h, int col, int32_t* out) {
  auto& c = ((ParsedTable*)h)->columns[col];
  for (size_t i = 0; i < c.codes.size(); ++i) out[i] = c.remap[c.codes[i]];
}

int tbl_dict_size(void* h, int col) {
  return (int)((ParsedTable*)h)->columns[col].dict.size();
}

long tbl_dict_bytes(void* h, int col) {
  auto& c = ((ParsedTable*)h)->columns[col];
  long total = 0;
  for (auto& s : c.dict) total += (long)s.size();
  return total;
}

void tbl_dict_lens(void* h, int col, int32_t* out) {
  // per-entry byte lengths: entries are concatenated without separators
  // (a separator byte could occur INSIDE a value — CSV strings may
  // contain newlines)
  auto& c = ((ParsedTable*)h)->columns[col];
  for (size_t i = 0; i < c.dict.size(); ++i)
    out[i] = (int32_t)c.dict[i].size();
}

void tbl_fill_dict(void* h, int col, char* out) {
  auto& c = ((ParsedTable*)h)->columns[col];
  char* p = out;
  for (auto& s : c.dict) {
    memcpy(p, s.data(), s.size());
    p += s.size();
  }
}

void tbl_free(void* h) { delete (ParsedTable*)h; }

}  // extern "C"
