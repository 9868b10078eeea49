package helixtpu

import (
	"bytes"
	"context"
	"encoding/json"
	"fmt"
	"io"
	"net/http"
	"strings"
	"time"
)

// Client targets a helix-tpu engine over HTTP (reference surface:
// sdks/go/client.go — NewClient + Exec with behavior-header options).
type Client struct {
	URL    string
	APIKey string
	HTTP   *http.Client
}

// NewClient builds a client bound to a base URL.
func NewClient(url string, apiKey string) *Client {
	return &Client{
		URL:    strings.TrimRight(url, "/"),
		APIKey: apiKey,
		HTTP:   &http.Client{Timeout: 300 * time.Second},
	}
}

// ExecOption toggles engine-behavior headers.
type ExecOption func(*http.Request)

// WriterOnly requires a writer node (x-helix-require-writer).
func WriterOnly() ExecOption {
	return func(r *http.Request) { r.Header.Set("x-helix-require-writer", "true") }
}

// WarmOnly serves only warm reads (x-helix-warm).
func WarmOnly() ExecOption {
	return func(r *http.Request) { r.Header.Set("x-helix-warm", "true") }
}

// AwaitDurability controls write durability acknowledgment.
func AwaitDurability(should bool) ExecOption {
	value := "true"
	if !should {
		value = "false"
	}
	return func(r *http.Request) { r.Header.Set("x-helix-await-durable", value) }
}

// Trace requests per-step timings ($trace in the response).
func Trace() ExecOption {
	return func(r *http.Request) { r.Header.Set("x-helix-trace", "true") }
}

// Exec posts a dynamic request and decodes the response into out.
func (c *Client) Exec(ctx context.Context, req *DynamicQueryRequest, out interface{}, opts ...ExecOption) error {
	body, err := req.ToJSON()
	if err != nil {
		return err
	}
	return c.post(ctx, "/v1/query", body, out, opts...)
}

// ExecStored calls a deployed route with bare parameters.
func (c *Client) ExecStored(ctx context.Context, name string, parameters map[string]J, out interface{}, opts ...ExecOption) error {
	if parameters == nil {
		parameters = map[string]J{}
	}
	body, err := json.Marshal(parameters)
	if err != nil {
		return err
	}
	return c.post(ctx, "/v1/query/"+name, body, out, opts...)
}

// DeployBundle installs a queries.json bundle.
func (c *Client) DeployBundle(ctx context.Context, bundle J, out interface{}) error {
	body, err := json.Marshal(bundle)
	if err != nil {
		return err
	}
	return c.post(ctx, "/v1/bundle", body, out)
}

// Health fetches engine liveness stats.
func (c *Client) Health(ctx context.Context, out interface{}) error {
	req, err := http.NewRequestWithContext(ctx, http.MethodGet, c.URL+"/v1/health", nil)
	if err != nil {
		return err
	}
	if c.APIKey != "" {
		req.Header.Set("Authorization", "Bearer "+c.APIKey)
	}
	resp, err := c.HTTP.Do(req)
	if err != nil {
		return err
	}
	defer resp.Body.Close()
	return decode(resp, out)
}

func (c *Client) post(ctx context.Context, route string, body []byte, out interface{}, opts ...ExecOption) error {
	req, err := http.NewRequestWithContext(
		ctx, http.MethodPost, c.URL+route, bytes.NewReader(body),
	)
	if err != nil {
		return err
	}
	req.Header.Set("Content-Type", "application/json")
	if c.APIKey != "" {
		req.Header.Set("Authorization", "Bearer "+c.APIKey)
	}
	for _, opt := range opts {
		opt(req)
	}
	resp, err := c.HTTP.Do(req)
	if err != nil {
		return err
	}
	defer resp.Body.Close()
	return decode(resp, out)
}

func decode(resp *http.Response, out interface{}) error {
	payload, err := io.ReadAll(resp.Body)
	if err != nil {
		return err
	}
	if resp.StatusCode != http.StatusOK {
		var remote struct {
			Error struct {
				Kind    string `json:"kind"`
				Message string `json:"message"`
			} `json:"error"`
		}
		if json.Unmarshal(payload, &remote) == nil && remote.Error.Message != "" {
			return fmt.Errorf("%s: %s", remote.Error.Kind, remote.Error.Message)
		}
		return fmt.Errorf("HTTP %d: %s", resp.StatusCode, string(payload))
	}
	if out == nil {
		return nil
	}
	return json.Unmarshal(payload, out)
}
